"""SML rules-file frontend: text round-trips into RuleSpec, with typed
validation errors (VERDICT r1 item #6; mirrors the reference's inline-SML
conftest fixtures, engine/conftest.py)."""

import pandas as pd
import pytest

from osprey_ray.sml import SmlValidationError, load_sml, parse_sml

FLAGSHIP_SML = """
ContainsHello = StringContains(s=text, substring='hello', word=True)
FreeMoneyText = StringContains(s=text, substring='free money')
HasSpamDomain: bool = RegexMatch(
  s=text,
  pattern='https?://(?:[^\\\\s/]*\\\\.)?(?:spam\\\\.example|shady\\\\.test)',
  case_insensitive=True,
)
TextLen: int = StringLength(s=text)
IsExec = tool == 'exec'
IsMail = tool == 'mail'
_susp = FreeMoneyText or HasSpamDomain

FlagCount5m = IncrementWindow(when=_susp, window_seconds=300)
TurnsThisHour = TumblingCount(when=True, bucket_seconds=3600)
sess = SessionWindow(gap_seconds=1800)
ToolAbuse = SequenceMatch(first=IsExec, second=IsMail, within_turns=3)

RuleHello = Rule(when_all=[ContainsHello], description='turn says hello')
RuleSpam = Rule(when_all=[_susp], description='spammy content')
RuleVelocity = Rule(when_all=[FlagCount5m >= 3])
RuleToolAbuse = Rule(when_all=[ToolAbuse])
RuleLongSession = Rule(when_all=[sess__count >= 50])
"""


def test_flagship_sql_spec_roundtrips_from_text():
    """The SML text above compiles to a spec whose engine output is
    byte-identical to the Python-dataclass flagship_sql_spec."""
    from osprey_ray.datagen import generate_transcripts
    from osprey_ray.oracle import oracle_results
    from osprey_ray.pipelines.flagship import flagship_sql_spec
    from osprey_ray.stages.stateless import compile_stateless
    from osprey_ray.stages.stateful import StatefulPartitionEval

    spec = parse_sml(FLAGSHIP_SML)
    ref = flagship_sql_spec()
    assert [f.name for f in spec.features] == [f.name for f in ref.features]
    assert [r.name for r in spec.rules] == [r.name for r in ref.rules]
    assert spec.stateful_names() == ref.stateful_names()

    tbl = generate_transcripts(1500, seed=7).drop_columns(["_arrival_us"])
    outs = []
    for s in (spec, ref):
        t1 = compile_stateless(s)(tbl)
        out = StatefulPartitionEval(s, {})(t1)
        outs.append(
            out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_labels_and_triggers_parse():
    spec = parse_sml(
        """
IsSpam = StringContains(s=text, substring='free money')
HasSpamLabel = HasLabel(label='spam_suspect', status='added')
RuleSpam = Rule(when_all=[IsSpam])
RuleEscalate = Rule(when_all=[IsSpam, HasSpamLabel])
WhenRules(
  rules_any=[RuleSpam],
  then=[DeclareVerdict('flag_spam'), LabelAdd('spam_suspect', expires_after=3600)],
)
WhenRules(rules_any=[RuleEscalate], then=[DeclareVerdict('ban')])
"""
    )
    assert len(spec.triggers) == 2
    assert spec.uses_labels()


def test_import_and_require(tmp_path):
    (tmp_path / "models").mkdir()
    (tmp_path / "models" / "base.sml").write_text(
        "TextLen = StringLength(s=text)\n"
    )
    (tmp_path / "tool.sml").write_text(
        "IsExec = tool == 'exec'\nRuleExec = Rule(when_all=[IsExec])\n"
    )
    (tmp_path / "main.sml").write_text(
        "Import(rules=['models/base.sml'])\n"
        "LongText = TextLen > 60\n"
        "Require(rule='tool.sml', require_if=LongText)\n"
    )
    spec = load_sml(str(tmp_path / "main.sml"))
    assert {f.name for f in spec.features} == {"TextLen", "LongText", "IsExec"}
    # the Required file's rules are gated on require_if
    rule = spec.rule_by_name()["RuleExec"]
    assert len(rule.when_all) == 2  # gate + original conjunct


def _errs(text):
    with pytest.raises(SmlValidationError) as ei:
        parse_sml(text)
    return [(e.kind, e.line) for e in ei.value.errors], ei.value.errors


def test_typed_errors():
    kinds, errs = _errs("X = StringLength(s=text) + 'abc'\n")
    assert ("type-error", 1) in kinds

    kinds, _ = _errs("X = NopeKernel(s=text)\n")
    assert ("unknown-udf", 1) in kinds

    kinds, _ = _errs("X = UnknownColumn\n")
    assert ("unknown-name", 1) in kinds

    kinds, _ = _errs("X = 1\nX = 2\n")
    assert ("duplicate-name", 2) in kinds

    kinds, _ = _errs("X: int = StringLength(s=text)\nY: str = X + 1\n")
    assert ("type-error", 2) in kinds

    kinds, _ = _errs("X = StringLength(text)\n")
    assert ("positional-args", 1) in kinds

    kinds, _ = _errs("WhenRules(rules_any=[NoSuchRule], then=[DeclareVerdict('v')])\n")
    assert ("unknown-rule", 1) in kinds

    # errors carry positions and accumulate (not fail-fast)
    kinds, errs = _errs("A = Nope1(s=text)\nB = Nope2(s=text)\n")
    assert len(errs) == 2 and {e.line for e in errs} == {1, 2}


def test_secret_annotation_taints():
    spec = parse_sml(
        "RawToken: Secret[str] = RegexExtract(s=text, pattern='tok_(\\\\w+)')\n"
        "HasToken = RawToken != None\n"
        "RuleToken = Rule(when_all=[HasToken])\n"
    )
    f = {x.name: x for x in spec.features}
    assert f["RawToken"].secret and not f["RawToken"].extracted


def test_in_string_vs_list():
    spec = parse_sml(
        "Lowered = StringToLower(s=text)\n"
        "HasHello = 'hello' in Lowered\n"
        "ToolKnown = tool in ['exec', 'mail']\n"
    )
    assert {x.name for x in spec.features} == {"Lowered", "HasHello", "ToolKnown"}


def test_examples_ruleset_loads_and_runs():
    """examples/rules/ (the reference's main.sml/models/rules layout) loads
    into a full label-feedback ruleset and evaluates against the oracle."""
    import os

    from osprey_ray.datagen import generate_transcripts
    from osprey_ray.oracle import oracle_results
    from osprey_ray.stages.stateless import compile_stateless
    from osprey_ray.stages.stateful import StatefulPartitionEval

    root = os.path.join(os.path.dirname(__file__), "..", "examples", "rules", "main.sml")
    spec = load_sml(root)
    assert spec.uses_labels()
    assert {r.name for r in spec.rules} >= {
        "RuleHello", "RuleSpam", "RuleVelocity", "RuleToolAbuse",
        "RuleLongSession", "RuleEscalate",
    }
    tbl = generate_transcripts(1200, seed=5).drop_columns(["_arrival_us"])
    t1 = compile_stateless(spec)(tbl)
    got = (
        StatefulPartitionEval(spec, {})(t1)
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = pd.DataFrame(oracle_results(tbl, spec, {}))
    assert len(got) == len(want)
    import numpy as np

    def norm(x):
        return list(x) if isinstance(x, (list, tuple, np.ndarray)) else x

    for k in ("RuleSpam", "RuleEscalate", "__verdicts"):
        assert [norm(x) for x in got[k]] == [norm(x) for x in want[k]], k


def test_import_escape_is_rejected(tmp_path):
    """Round-3 advice: includes are confined to the ruleset root — '../'
    and absolute paths are typed invalid-import errors, never file reads."""
    import pytest

    from osprey_ray.sml import SmlValidationError, load_sml

    outside = tmp_path / "secret.txt"
    outside.write_text("TextLen = StringLength(s=text)\n")
    rules = tmp_path / "rules"
    rules.mkdir()
    (rules / "esc.sml").write_text("Import(rules=['../secret.txt'])\n")
    with pytest.raises(SmlValidationError, match="invalid-import"):
        load_sml(str(rules / "esc.sml"))
    (rules / "abs.sml").write_text(f"Require(rule='{outside}')\n")
    with pytest.raises(SmlValidationError, match="invalid-import"):
        load_sml(str(rules / "abs.sml"))


def test_union_annotation():
    """Union[...] annotations: accepted when the expression matches any
    variant; one-item and duplicate unions are the reference's typed
    errors (udf/rvalue_type_checker.py:115-155)."""
    spec = parse_sml("X: Union[int, str] = StringLength(s=text)\n")
    assert spec.features[0].name == "X"

    kinds, _ = _errs("X: Union[int] = StringLength(s=text)\n")
    assert ("invalid-annotation", 1) in kinds

    kinds, _ = _errs("X: Union[int, int] = StringLength(s=text)\n")
    assert ("invalid-annotation", 1) in kinds

    kinds, _ = _errs("X: Union[bool, str] = StringLength(s=text)\n")
    assert ("type-error", 1) in kinds


def test_extract_literal_and_constants():
    """Constant assignments are filtered from the output unless annotated
    ExtractLiteral (grammar.py:362-368 should_extract)."""
    spec = parse_sml(
        "TextLen: int = StringLength(s=text)\n"
        "Threshold = 42\n"
        "Tagged: ExtractLiteral[int] = 42\n"
        "UsesIt = TextLen > Threshold\n"
    )
    f = {x.name: x for x in spec.features}
    assert f["Threshold"].is_constant() and not f["Threshold"].extracted
    assert f["Tagged"].extract_literal and f["Tagged"].extracted
    assert f["UsesIt"].extracted  # using a constant does not taint


def test_extract_secret_launders_taint():
    """ExtractSecret[...] extracts despite depending on Secret data, and
    its dependents are untainted (grammar.py:390-394 can_extract)."""
    from osprey_ray.rules import extracted_names

    spec = parse_sml(
        "RawToken: Secret[str] = RegexExtract(s=text, pattern='tok_(\\\\w+)')\n"
        "TokenHash: ExtractSecret[str] = HashSha256(s=RawToken)\n"
        "HashLen = StringLength(s=TokenHash)\n"
        "Leaky = StringToUpper(s=RawToken)\n"
    )
    names = extracted_names(spec.features)
    assert "RawToken" not in names          # secret
    assert "TokenHash" in names             # ExtractSecret forces
    assert "HashLen" in names               # laundered via TokenHash
    assert "Leaky" not in names             # still tainted via RawToken


def test_dynamic_udf_requires_annotation():
    """Dynamic-return UDFs must be assigned with a type annotation
    (validate_dynamic_calls_have_annotated_rvalue.py:33-60)."""
    kinds, _ = _errs("Data = JsonData(data=text)\n")
    assert ("must-annotate", 1) in kinds

    spec = parse_sml("Data: str = JsonData(data=text)\n")
    assert spec.features[0].name == "Data"


def test_sml_stream_patterns_parse_and_drive_engine(tmp_path):
    """AbsenceAlert / FollowedBy declared in an SML file land on
    RuleSpec.absences / .follows with compiled predicates; the parsed spec
    drives the streaming engine identically to the hand-built one."""
    from osprey_ray.rules import AbsenceAlert, FollowedBy
    from osprey_ray.sml import parse_sml

    spec = parse_sml(
        "IsExec = tool == 'exec'\n"
        "Unanswered = AbsenceAlert(first=tool == 'exec', "
        "second=tool == 'mail', window_seconds=600.0)\n"
        "ExecMail = FollowedBy(first=tool == 'exec', "
        "second=tool == 'mail', window_seconds=600.0)\n"
    )
    assert [a.name for a in spec.absences] == ["Unanswered"]
    assert isinstance(spec.absences[0], AbsenceAlert)
    assert [f.name for f in spec.follows] == ["ExecMail"]
    assert isinstance(spec.follows[0], FollowedBy)
    assert spec.follows[0].window_seconds == 600.0
    # content hash distinguishes stream patterns
    base = parse_sml("IsExec = tool == 'exec'\n")
    assert spec.content_hash() != base.content_hash()


def test_sml_stream_pattern_errors():
    """Bad stream-pattern declarations produce positioned errors: non-bool
    predicate, non-constant window, unknown kwarg."""
    import pytest

    from osprey_ray.sml import SmlValidationError, parse_sml

    with pytest.raises(SmlValidationError) as ei:
        parse_sml("P = FollowedBy(first=text, second=tool == 'mail', "
                  "window_seconds=600.0)\n")
    assert any(e.kind == "type-error" for e in ei.value.errors)

    with pytest.raises(SmlValidationError) as ei:
        parse_sml("P = FollowedBy(first=tool == 'a', second=tool == 'b', "
                  "window_seconds=StringLength(target=text))\n")
    assert any(e.kind == "invalid-literal" for e in ei.value.errors)

    with pytest.raises(SmlValidationError) as ei:
        parse_sml("P = AbsenceAlert(first=tool == 'a', second=tool == 'b', "
                  "window_seconds=0)\n")
    assert any(e.kind == "invalid-spec" for e in ei.value.errors)
