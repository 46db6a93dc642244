"""Variant cube identity tests (ref: crates/pokerkit/src/variant.rs)."""

import uuid

from robopoker_tpu.pokerkit.variant import (
    FISH,
    SLUMBOT_USERNAME,
    SLUMBOT_UUID,
    VARIANT_NAMESPACE,
    Variant,
)

ALL_LABELS = [
    "base", "depth", "world", "dirac", "depth+world", "depth+dirac",
    "world+dirac", "depth+world+dirac", "fish",
]


def test_canonical_order_and_labels():
    assert [v.label for v in Variant.all()] == ALL_LABELS


def test_parse_roundtrip_every_label():
    for v in Variant.all():
        assert Variant.parse(v.label) == v


def test_parse_rejects_noncanonical():
    # flags out of canonical order, duplicates, unknown tokens
    for bad in ("world+depth", "dirac+depth", "depth+depth", "nit", "",
                "depth+world+dirac+dirac", "fish+depth"):
        assert Variant.parse(bad) is None


def test_wire_roundtrip():
    for v in Variant.all():
        assert Variant.from_wire(v.to_wire()) == v
    assert FISH.to_wire() == {"kind": "fish"}


def test_uuid_is_stable_v5_of_username():
    v = Variant.parse("depth+world")
    assert v.username == "bot:depth+world"
    assert v.uuid == uuid.uuid5(VARIANT_NAMESPACE, "bot:depth+world")
    assert v.uuid.version == 5
    # namespace bytes spell the reference's literal (variant.rs:38-41)
    assert VARIANT_NAMESPACE.bytes == b"robopoker.bots.v"


def test_uuids_all_distinct():
    ids = {v.uuid for v in Variant.all()} | {SLUMBOT_UUID}
    assert len(ids) == 10
    assert SLUMBOT_USERNAME == "bot:slumbot"


def test_descriptions_cover_cube():
    assert Variant.parse("base").description == "Sampled blueprint"
    assert Variant.parse("depth+world+dirac").description == "Full subgame solver"
    assert FISH.description == "Random actions"
    assert FISH.requires_blueprint is False
    assert Variant.parse("dirac").requires_blueprint is True
