FlagCount5m = IncrementWindow(when=_susp, window_seconds=300)
TurnsThisHour = TumblingCount(when=True, bucket_seconds=3600)
sess = SessionWindow(gap_seconds=1800)
ToolAbuse = SequenceMatch(first=IsExec, second=IsMail, within_turns=3)

RuleVelocity = Rule(
  when_all=[FlagCount5m >= 3],
  description='3+ flagged turns in 5 minutes',
)
RuleToolAbuse = Rule(when_all=[ToolAbuse], description='exec then mail within 3 turns')
RuleLongSession = Rule(when_all=[sess__count >= 50])
