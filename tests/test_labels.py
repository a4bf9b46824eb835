"""LabelStore semantics vs the reference's documented behavior
(osprey_shared/labels.py:41-186, stdlib/udfs/labels.py:176-224)."""

from osprey_ray.state.labels import LabelStore


def test_basic_add_read():
    s = LabelStore()
    assert s.has_label("c1", "spam", 100, "added") is False
    assert s.has_label("c1", "spam", 100, "removed") is True  # absent = removed
    s.apply("c1", "spam", "added", 100, None)
    assert s.has_label("c1", "spam", 200, "added") is True
    assert s.has_label("c1", "spam", 200, "removed") is False


def test_expiry_event_time():
    s = LabelStore()
    s.apply("c1", "spam", "added", 100, expires_us=500)
    assert s.has_label("c1", "spam", 400, "added") is True
    assert s.has_label("c1", "spam", 500, "added") is False  # expires_at <= now
    assert s.has_label("c1", "spam", 600, "removed") is True


def test_multiple_reasons_all_must_expire():
    s = LabelStore()
    s.apply("c1", "spam", "added", 100, expires_us=500)
    s.apply("c1", "spam", "added", 200, expires_us=900)
    assert s.has_label("c1", "spam", 600, "added") is True  # one reason alive
    assert s.has_label("c1", "spam", 900, "added") is False


def test_reason_without_expiry_never_expires():
    s = LabelStore()
    s.apply("c1", "spam", "added", 100, None)
    assert s.has_label("c1", "spam", 10**15, "added") is True


def test_manual_precedence():
    s = LabelStore()
    s.apply("c1", "spam", "manually_removed", 100, None)
    # automatic add cannot override live manual removal (labels.py:41-56)
    assert s.apply("c1", "spam", "added", 200, None) is False
    assert s.has_label("c1", "spam", 300, "added") is False
    assert s.has_label("c1", "spam", 300, "removed") is True
    assert s.has_label("c1", "spam", 300, "removed", manual="yes") is True
    # manual add overrides manual removal
    assert s.apply("c1", "spam", "manually_added", 400, None) is True
    assert s.has_label("c1", "spam", 500, "added", manual="yes") is True
    assert s.has_label("c1", "spam", 500, "added", manual="no") is False


def test_expired_manual_allows_auto():
    s = LabelStore()
    s.apply("c1", "spam", "manually_removed", 100, expires_us=200)
    assert s.apply("c1", "spam", "added", 300, None) is True
    assert s.has_label("c1", "spam", 400, "added") is True


def test_conflicting_mutations_weight():
    s = LabelStore()
    # one turn produces add + remove for same label: ADDED(1) beats REMOVED(0)
    applied = s.apply_conflicting("c1", [("spam", "removed", None), ("spam", "added", None)], 100)
    assert applied == [("spam", "added")]
    assert s.has_label("c1", "spam", 200, "added") is True


def test_snapshot_roundtrip():
    s = LabelStore()
    s.apply("c1", "spam", "added", 100, 500)
    s.apply("c2", "ok", "manually_added", 150, None)
    s2 = LabelStore.restore(s.snapshot())
    assert s2.has_label("c1", "spam", 400, "added") is True
    assert s2.has_label("c1", "spam", 600, "added") is False
    assert s2.has_label("c2", "ok", 200, "added", manual="yes") is True
