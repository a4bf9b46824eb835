Import(rules=['models/base.sml'])

RuleHello = Rule(when_all=[ContainsHello], description='turn says hello')
RuleSpam = Rule(when_all=[_susp], description='spammy content')

Require(rule='conduct/velocity.sml')

HasSpamLabel = HasLabel(label='spam_suspect', status='added')
RuleEscalate = Rule(when_all=[_susp, HasSpamLabel], description='spam from labeled conv')

WhenRules(
  rules_any=[RuleSpam],
  then=[DeclareVerdict('flag_spam'), LabelAdd('spam_suspect', expires_after=3600)],
)
WhenRules(rules_any=[RuleVelocity, RuleToolAbuse], then=[DeclareVerdict('escalate')])
WhenRules(rules_any=[RuleEscalate], then=[DeclareVerdict('ban')])
WhenRules(rules_any=[RuleHello], then=[DeclareVerdict('greet')])
