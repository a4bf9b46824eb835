# Stream-emission patterns: watermark-driven rows on their own exactly-once
# streams (absence alerts / interval-join pairs), declared like features.
ExecUnanswered = AbsenceAlert(first=tool == 'exec', second=tool == 'mail', window_seconds=600.0)
ExecThenMail = FollowedBy(first=tool == 'exec', second=tool == 'mail', window_seconds=600.0)
