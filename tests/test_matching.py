"""find_matches (M1/M2/M7/M9) batch query tests against the
reference-shaped entity fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_spark import datagen
from resolve_spark.functions import normalize as N
from resolve_spark.operators import blocking as B
from resolve_spark.operators.matching import find_matches
from resolve_spark.operators.scoring import FieldSpec
from resolve_spark.plans.pipeline import entities_pipeline_config


@pytest.fixture(scope="module")
def prepared(spark):
    cfg = entities_pipeline_config()
    ents = datagen.entity_rows(spark)
    ents = N.normalize_entity(ents, cfg.normalize_types)
    ents = ents.withColumn("block_key", B.canopy_key(ents.columns, ("name", "zip")))
    # the reference's sample query shape: name + address + city/state/zip
    queries = spark.createDataFrame(
        [("q-1", "Vertex Analytics", "742 Birch Street", "Springfield", "IL", "62704",
          "", "")],
        ["query_id", "name", "address", "city", "state", "zip", "phone", "email"],
    )
    queries = N.normalize_entity(queries, cfg.normalize_types)
    queries = queries.withColumn(
        "block_key", B.canopy_key(queries.columns, ("name", "zip"))
    )
    return cfg, queries, ents


def test_find_matches_blocked(spark, prepared):
    cfg, queries, ents = prepared
    out = find_matches(
        queries, ents, list(cfg.specs), entity_id="id",
        limit=10, threshold=0.5,
    ).collect()
    ids = [r["match_id"] for r in out]
    # the duplicate pair blocks with the query (same name prefix + zip)
    assert set(ids) == {"e-001", "e-002"}
    top = out[0]
    assert top["rank"] == 1 and top["score"] >= 0.5
    assert "confidence" in top["explanation"]
    assert set(top["field_scores"].keys()) == {s.name for s in cfg.specs}


def test_find_matches_unblocked_cross(spark, prepared):
    cfg, queries, ents = prepared
    out = find_matches(
        queries, ents, list(cfg.specs), entity_id="id",
        block_key=None, limit=3, threshold=0.0,
    ).collect()
    assert len(out) == 3  # top-3 of all 10 under threshold 0
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["match_id"] in ("e-001", "e-002")


def test_find_matches_threshold_and_limit(spark, prepared):
    cfg, queries, ents = prepared
    out = find_matches(
        queries, ents, list(cfg.specs), entity_id="id",
        block_key=None, limit=1, threshold=0.5,
    ).collect()
    assert len(out) == 1
    assert out[0]["rank"] == 1


def test_specs_from_options_reference_semantics():
    from resolve_spark.operators.scoring import specs_from_options
    specs = specs_from_options(
        ["name", "zip", "notes", "city"],
        field_type_mappings={"city": "street_address"},
        force_exact_match_fields=["zip"],
        field_weights={"name": 0.4},
    )
    by = {s.name: s for s in specs}
    assert by["name"].kernel == "name" and by["name"].weight == 0.4
    assert by["zip"].kernel == "exact"          # force-exact override
    assert by["city"].kernel == "street_address"  # explicit mapping wins
    assert by["notes"].kernel == "text"         # F8 default
    assert by["notes"].weight == 1.0


def test_find_matches_text(spark, prepared):
    from resolve_spark.operators.matching import find_matches_text
    _, _, ents = prepared
    out = find_matches_text(
        spark, "name=Vertex Analytics; city=Springfield", ents,
        entity_id="id", limit=5, threshold=0.5,
    ).collect()
    assert [r["match_id"] for r in out][:2] == ["e-002", "e-001"] or \
        set(r["match_id"] for r in out[:2]) == {"e-001", "e-002"}
    assert all(r["query_id"] == "q-text" for r in out)


def test_find_matches_text_rejects_plain_text(spark, prepared):
    import pytest as _pytest
    from resolve_spark.operators.matching import find_matches_text
    _, _, ents = prepared
    with _pytest.raises(ValueError):
        find_matches_text(spark, "just a name with no fields", ents)


def test_find_matches_text_with_block_key(spark, prepared):
    """A non-None block_key must compute a REAL canopy key for the query
    row (not NULL) so the equi-join can match the store."""
    from resolve_spark.operators.matching import find_matches_text

    cfg, _queries, ents = prepared
    out = find_matches_text(
        spark,
        "name=Vertex Analytics; zip=62704",
        ents,
        entity_id="id",
        block_key="block_key",
        threshold=0.3,
        block_fields=("name", "zip"),
    ).collect()
    assert {r["match_id"] for r in out} >= {"e-001"}


def test_metadata_roundtrip_through_matching(spark):
    """EntityRecord.Metadata parity (weaviate.go:47, match.go:22): a
    metadata map on the entity store survives normalize -> block ->
    find_matches and lands verbatim on each match row."""
    cfg = entities_pipeline_config()
    ents = datagen.entity_rows(spark, with_metadata=True)
    ents = N.normalize_entity(ents, cfg.normalize_types)
    ents = ents.withColumn("block_key", B.canopy_key(ents.columns, ("name", "zip")))
    queries = ents.where(F.col("id") == "e-001").withColumnRenamed("id", "query_id")
    out = find_matches(queries, ents, list(cfg.specs), entity_id="id",
                       limit=5, threshold=0.5).collect()
    assert out, "expected at least the planted duplicate to match"
    by_id = {r["match_id"]: r["metadata"] for r in out}
    raw = {r["id"]: (r["source"], r["type"]) for r in datagen.entity_rows(spark).collect()}
    for mid, meta in by_id.items():
        assert meta == {"source_system": raw[mid][0], "record_kind": raw[mid][1]}
