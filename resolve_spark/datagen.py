"""Deterministic synthetic inputs (SURVEY.md §7 step 1, FIXTURES.md).

Two generators, both seed-stable and partition-stable (every value is a
pure function of a row's uid, so output is identical at any parallelism):

1. ``synth_files`` — the graft input table per BASELINE.json input_hint:
   ``(repo, path, commit, lang, content)`` source-code files, with
   planted near-duplicate variants mirroring the reference fixture's
   Acme-pair construction (name/format variants, whitespace/comment
   content edits, differing commits) and a configurable hot repo for
   skew testing. Emits matching ``labeled_pairs`` ground truth.

2. ``entity_rows`` — a small reference-shaped business-entity fixture
   (same schema as /root/reference/testdata/sample-entities.json; values
   are our own) whose first two rows are a planted duplicate pair.

Generation runs distributed via mapInPandas over spark.range — the
generator itself scales with the cluster.
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FILES_SCHEMA = "uid long, entity_uid long, repo string, path string, commit string, lang string, content string, is_variant boolean"

_LANGS = [("java", "java"), ("py", "py"), ("go", "go"), ("ts", "ts"), ("rs", "rs")]
_VOCAB = [
    "parse", "config", "handler", "stream", "buffer", "index", "token",
    "client", "server", "merge", "split", "cache", "queue", "batch",
    "reader", "writer", "filter", "reduce", "shard", "codec", "vector",
    "record", "schema", "column", "offset", "cursor", "worker", "signal",
]
_MODULES = ["core", "util", "io", "net", "api", "db", "auth", "fmt"]


def _rng(uid: int, salt: str) -> random.Random:
    h = hashlib.sha256(f"{salt}:{uid}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _sha_hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _gen_content(rng: random.Random, lang: str) -> str:
    # per-file identifier vocabulary (fn_<hex>, var<num>) keeps token sets
    # distinctive across entities — shared _VOCAB alone would make every
    # content pair near-Jaccard-1 at this vocabulary size
    idents = [
        f"{rng.choice(_VOCAB)}_{rng.randrange(16**6):06x}" for _ in range(rng.randint(4, 10))
    ]
    n_lines = rng.randint(6, 40)
    lines = []
    for _ in range(n_lines):
        toks = [
            rng.choice(idents) if rng.random() < 0.55 else rng.choice(_VOCAB)
            for _ in range(rng.randint(3, 8))
        ]
        indent = "    " * rng.randint(0, 2)
        lines.append(indent + " ".join(toks) + ("()" if rng.random() < 0.3 else ""))
    return "\n".join(lines)


def _base_record(uid: int, n_repos: int, hot_repo_share: float) -> dict:
    rng = _rng(uid, "base")
    # hot repo: repo 0 absorbs hot_repo_share of rows (skew fixture)
    if rng.random() < hot_repo_share:
        repo_idx = 0
    else:
        repo_idx = rng.randint(1, max(1, n_repos - 1))
    org = f"org{repo_idx % 97}"
    proj = f"{rng.choice(_VOCAB)}-{rng.choice(_VOCAB)}" if repo_idx else "mega-monorepo"
    repo = f"{org}/{proj}" if repo_idx else "acme/mega-monorepo"
    ext, lang = _LANGS[rng.randrange(len(_LANGS))]
    module = rng.choice(_MODULES)
    # uid-derived filename suffix: a filesystem holds ONE file per
    # (repo, path), so distinct entities must not collide on full path
    fname = (
        f"{rng.choice(_VOCAB).capitalize()}{rng.choice(_VOCAB).capitalize()}"
        f"{uid % 4096:03x}"
    )
    path = f"src/{module}/{fname}.{ext}"
    content = _gen_content(rng, lang)
    commit = _sha_hex(f"commit:{uid}")[:40]
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


def _variant_of(base: dict, uid: int, variant_idx: int) -> dict:
    """Near-duplicate construction mirroring the reference's Acme pair
    (sample-entities.json entities 001/002: case/abbreviation variants,
    same identity): path case/separator changes, repo rename variants,
    whitespace/comment-only content edits, different commit."""
    rng = _rng(uid, f"variant{variant_idx}")
    rec = dict(base)
    roll = rng.random()
    if roll < 0.35:  # path case/separator variant
        p = rec["path"]
        p = p.replace("/", "\\") if rng.random() < 0.3 else p
        rec["path"] = p.upper() if rng.random() < 0.5 else p.capitalize()
    elif roll < 0.6:  # repo rename variant
        r = rec["repo"]
        rec["repo"] = r.replace("-", "_") if "-" in r else r + "-inc"
    elif roll < 0.85:  # content whitespace edit (identity-preserving)
        rec["content"] = rec["content"].replace("\n", "\n\n", 3) + "\n"
    else:  # comment-only content edit
        rec["content"] = "# vendored copy\n" + rec["content"]
    rec["commit"] = _sha_hex(f"commit:{uid}:v{variant_idx}")[:40]
    return rec


def synth_files(
    spark: SparkSession,
    n_base: int = 10_000,
    dup_rate: float = 0.2,
    n_repos: int = 500,
    hot_repo_share: float = 0.2,
    seed: int = 42,  # seed is baked into _rng salts; kept for signature clarity
) -> DataFrame:
    """Distributed deterministic files table with planted duplicates.

    Row uid < n_base are base records; each base uid with
    rng(uid).random() < dup_rate gets variant rows at uid + n_base * k.
    ``entity_uid`` ties variants to their base (ground truth).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for uid in pdf["id"]:
                uid = int(uid)
                base = _base_record(uid, n_repos, hot_repo_share)
                rows.append({"uid": uid, "entity_uid": uid, "is_variant": False, **base})
                vr = _rng(uid, "dup")
                if vr.random() < dup_rate:
                    n_var = vr.randint(1, 2)
                    for k in range(1, n_var + 1):
                        var = _variant_of(base, uid, k)
                        rows.append({
                            "uid": uid + n_base * k, "entity_uid": uid,
                            "is_variant": True, **var,
                        })
            yield pd.DataFrame(rows, columns=[
                "uid", "entity_uid", "repo", "path", "commit", "lang",
                "content", "is_variant",
            ])

    return (
        spark.range(n_base)
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
        .mapInPandas(gen, schema=FILES_SCHEMA)
    )


def with_record_id(df: DataFrame) -> DataFrame:
    """record_id = sha256(repo||path||commit) prefix; content_sha256 is
    the per-row invariant column (BASELINE.json input_hint)."""
    return df.withColumn(
        "record_id",
        F.substring(F.sha2(F.concat_ws("\x1f", "repo", "path", "commit"), 256), 1, 20),
    ).withColumn("content_sha256", F.sha2(F.col("content"), 256))


def labeled_pairs(files: DataFrame) -> DataFrame:
    """Ground-truth pairs from the planting process: all same-entity_uid
    pairs are matches; negatives are sampled below (driver-side eval
    joins them against candidate pairs)."""
    ids = with_record_id(files).select("record_id", "entity_uid")
    a = ids.selectExpr("record_id as id_a", "entity_uid as ea")
    b = ids.selectExpr("record_id as id_b", "entity_uid as eb")
    return (
        a.join(b, F.col("ea") == F.col("eb"))
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(True).alias("is_match"))
    )


# ---------------------------------------------------------------------------
# Reference-shaped synthetic entity corpus (person/business domain)
# ---------------------------------------------------------------------------

_FIRST = ["vertex", "quantum", "beacon", "cascade", "northgate", "helios",
          "marigold", "ironwood", "lakeshore", "summit", "pioneer", "redwood",
          "bluebird", "granite", "harbor", "meridian", "keystone", "willow"]
_SECOND = ["analytics", "logistics", "materials", "foods", "energy", "studio",
           "consulting", "partners", "holdings", "systems", "labs", "works",
           "dynamics", "supply", "media", "transport", "outfitters", "group"]
_SUFFIXES = ["Inc.", "LLC", "Corp.", "Ltd.", "Corporation", ""]
_STREETS = ["Birch", "Harbor", "Commerce", "Maple", "Industrial", "Mill",
            "Solar", "Canal", "Summit", "Cedar", "Juniper", "Dockside"]
_STREET_TYPES = ["Street", "Avenue", "Boulevard", "Road", "Lane", "Drive"]
_CITIES = [("Springfield", "IL"), ("Portland", "OR"), ("Austin", "TX"),
           ("Denver", "CO"), ("Tacoma", "WA"), ("Columbus", "OH"),
           ("Phoenix", "AZ"), ("Providence", "RI"), ("Boise", "ID"),
           ("Madison", "WI")]
_STATE_NAMES = {"IL": "Illinois", "OR": "Oregon", "TX": "Texas",
                "CO": "Colorado", "WA": "Washington", "OH": "Ohio",
                "AZ": "Arizona", "RI": "Rhode Island", "ID": "Idaho",
                "WI": "Wisconsin"}

ENTITY_SYNTH_SCHEMA = ("id string, entity_uid long, name string, address string, "
                       "city string, state string, zip string, phone string, "
                       "email string, is_variant boolean")


def _base_entity(uid: int) -> dict:
    rng = _rng(uid, "ent")
    first, second = rng.choice(_FIRST), rng.choice(_SECOND)
    name = f"{first.capitalize()} {second.capitalize()}"
    suffix = rng.choice(_SUFFIXES)
    city, state = _CITIES[rng.randrange(len(_CITIES))]
    zip5 = f"{10000 + (uid * 37) % 89999}"
    area = 200 + (uid * 7) % 799
    phone = f"({area}) 555-{(uid * 13) % 10000:04d}"
    return {
        "name": f"{name} {suffix}".strip(),
        "address": f"{100 + uid % 9000} {rng.choice(_STREETS)} {rng.choice(_STREET_TYPES)}",
        "city": city, "state": state, "zip": zip5, "phone": phone,
        "email": f"info@{first}{second}.com",
    }


def _entity_variant(base: dict, uid: int, k: int) -> dict:
    """Acme-pair-style variants (sample-entities.json 001/002): legal
    suffix changes, street abbreviation, state spelled out, phone
    formatting, email user changes — the blocking key (name[:3], zip[:5])
    is preserved, as in the reference's fixtures."""
    rng = _rng(uid, f"entvar{k}")
    rec = dict(base)
    name_root = rec["name"]
    for s in _SUFFIXES:
        if s and name_root.endswith(s):
            name_root = name_root[: -len(s)].strip()
    rec["name"] = f"{name_root} {rng.choice(_SUFFIXES)}".strip()
    if rng.random() < 0.6:
        for full, abbr in (("Street", "St"), ("Avenue", "Ave"), ("Boulevard", "Blvd"),
                           ("Road", "Rd"), ("Lane", "Ln"), ("Drive", "Dr")):
            rec["address"] = rec["address"].replace(full, abbr)
    if rng.random() < 0.5:
        rec["state"] = _STATE_NAMES.get(rec["state"], rec["state"])
    if rng.random() < 0.5:
        digits = "".join(ch for ch in rec["phone"] if ch.isdigit())
        rec["phone"] = f"{digits[:3]}-{digits[3:6]}-{digits[6:]}"
    if rng.random() < 0.4:
        rec["email"] = rec["email"].replace("info@", "contact@")
    return rec


def synth_entities(
    spark: SparkSession, n_base: int = 2000, dup_rate: float = 0.25
) -> DataFrame:
    """Deterministic reference-domain entity table with planted
    duplicates; ground truth via entity_uid (cf. labeled_entity_pairs)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for uid in pdf["id"]:
                uid = int(uid)
                base = _base_entity(uid)
                rows.append({"id": f"e{uid:07d}", "entity_uid": uid,
                             "is_variant": False, **base})
                if _rng(uid, "entdup").random() < dup_rate:
                    var = _entity_variant(base, uid, 1)
                    rows.append({"id": f"e{uid:07d}v", "entity_uid": uid,
                                 "is_variant": True, **var})
            yield pd.DataFrame(rows, columns=[
                "id", "entity_uid", "name", "address", "city", "state",
                "zip", "phone", "email", "is_variant",
            ])

    return (
        spark.range(n_base)
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
        .mapInPandas(gen, schema=ENTITY_SYNTH_SCHEMA)
    )


def labeled_entity_pairs(entities: DataFrame) -> DataFrame:
    a = entities.selectExpr("id as id_a", "entity_uid as ea")
    b = entities.selectExpr("id as id_b", "entity_uid as eb")
    return (
        a.join(b, F.col("ea") == F.col("eb"))
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(True).alias("is_match"))
    )


# ---------------------------------------------------------------------------
# Reference-shaped entity fixture (kernel/pipeline smoke tests)
# ---------------------------------------------------------------------------

ENTITY_COLUMNS = ["id", "name", "address", "city", "state", "zip", "phone", "email", "source", "type"]

ENTITY_ROWS = [
    # rows 1+2: planted duplicate pair (name suffix + street abbreviation
    # + state spelling + phone formatting variants; same identity)
    ("e-001", "Vertex Analytics Inc.", "742 Birch Street", "Springfield", "IL",
     "62704", "+1 (312) 555-0198", "info@vertexanalytics.com", "CRM", "business"),
    ("e-002", "Vertex Analytics", "742 Birch St", "Springfield", "Illinois",
     "62704", "312-555-0198", "sales@vertexanalytics.com", "Web", "business"),
    ("e-003", "Quantum Logistics LLC", "88 Harbor Road", "Portland", "OR",
     "97209", "503-555-0142", "ops@quantumlogistics.io", "CRM", "business"),
    ("e-004", "Beacon Health Partners", "1500 Commerce Boulevard", "Austin", "TX",
     "78701", "512-555-0170", "hello@beaconhealth.org", "CRM", "business"),
    ("e-005", "R. T. Calloway", "19 Maple Lane Apt 3C", "Denver", "CO",
     "80203", "720-555-0111", "rtc@mailhub.net", "Import", "individual"),
    ("e-006", "Cascade Materials Corp.", "4040 Industrial Parkway", "Tacoma", "WA",
     "98402", "253-555-0129", "contact@cascadematerials.com", "CRM", "business"),
    ("e-007", "Northgate Foods", "210 Mill Avenue Suite 12", "Columbus", "OH",
     "43215", "614-555-0186", "orders@northgatefoods.com", "Web", "business"),
    ("e-008", "Helios Energy Ltd.", "7 Solar Way", "Phoenix", "AZ",
     "85004", "602-555-0154", "support@heliosenergy.com", "CRM", "business"),
    ("e-009", "Marigold Studio", "33 Canal Street", "Providence", "RI",
     "02903", "401-555-0163", "hi@marigold.studio", "Web", "business"),
    ("e-010", "Ironwood Consulting Group", "901 Summit Drive", "Boise", "ID",
     "83702", "208-555-0137", "team@ironwoodcg.com", "Import", "business"),
]


def entity_rows(spark: SparkSession, with_metadata: bool = False) -> DataFrame:
    """Reference-shaped entity fixtures; ``with_metadata`` adds the
    EntityRecord.Metadata map column (weaviate.go:47) so round-trip
    tests can assert it survives pipeline -> store -> match results."""
    df = spark.createDataFrame(ENTITY_ROWS, ENTITY_COLUMNS)
    if with_metadata:
        df = df.withColumn(
            "metadata",
            F.create_map(
                F.lit("source_system"), F.col("source"),
                F.lit("record_kind"), F.col("type"),
            ),
        )
    return df
