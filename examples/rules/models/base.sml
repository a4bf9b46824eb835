ContainsHello = StringContains(s=text, substring='hello', word=True)
FreeMoneyText = StringContains(s=text, substring='free money')
HasSpamDomain: bool = RegexMatch(
  s=text,
  pattern='https?://(?:[^\\s/]*\\.)?(?:spam\\.example|shady\\.test)',
  case_insensitive=True,
)
TextLen: int = StringLength(s=text)
IsExec = tool == 'exec'
IsMail = tool == 'mail'
_susp = FreeMoneyText or HasSpamDomain
