"""Deterministic synthetic-data generator for the ER pipeline.

Builds, from a fixed seed and scale knob, every fixture table in
FIXTURES.md: the ``transcripts`` input (BASELINE.json input_hint schema),
the per-type normalization dictionaries (reference ``oid||name|name`` files
-> long-format tables, chemical_normalizer.py:34-40 et al.), gene auxiliary
dicts (gene_auxiliary_normalizer.py:36-44), metadata tables
(normalize.py:97-150), the ``id_merge`` edge table (normalize.py:89-95),
plus golden mentions and labeled pairs for the F1 oracle.

Everything is driven by ``random.Random(seed)`` — no wall clock, no global
state — so two runs at the same (seed, n_convs) are byte-identical.

Planted-text rules that make golden offsets exact (SURVEY §7 hard part b):
- exotic unicode chars are injected only via 1-char-for-1-char P1/P2 maps,
  so offsets on raw text == offsets on canonical text;
- >50-char words (P3 truncation) are planted only after the last mention
  of a turn, so truncation never shifts a recorded span.
"""

from __future__ import annotations

import itertools
import random
import string
from dataclasses import dataclass, field

# Human-species stoplist words (SR4GN list, utils.py:269-276): extraction
# finds them as species mentions, the P5 filter must drop them.
SPECIES_STOPLIST = (
    "person|infant|Child|people|participants|woman|"
    "Girls|Man|Peoples|Men|Participant|Patients|"
    "humans|Persons|mans|participant|Infants|Boys|"
    "Human|Humans|Women|children|Mans|child|Participants|Girl|"
    "Infant|girl|patient|patients|boys|men|infants|"
    "man|girls|Children|Boy|women|persons|human|Woman|"
    "peoples|Patient|People|boy|Person"
).split("|")

_ETYPES = ["gene", "disease", "drug", "species", "mutation"]

# 1:1 unicode chars safe to inject (each maps to ' ' under P1/P2).
_UNICODE_SPACES = ["\u2028", "\u00A0", "\u2009", "\u2005", "\t"]

_FILLER = (
    "the assistant reviewed the record and summarized findings for "
    "follow up while the user asked about dosage interactions and "
    "observed symptoms during the prior visit then requested a plan"
).split()


@dataclass
class Entity:
    entity_id: str
    etype: str
    oid: str | None  # None => not in normalization dicts (CUI-less path)
    surfaces: list[str]  # all extractable surface forms
    dict_names: list[str] = field(default_factory=list)  # subset in norm dict


def _typo(rng: random.Random, s: str) -> str:
    """One deterministic character edit that keeps high string similarity."""
    if len(s) < 5:
        return s + "x"
    i = rng.randrange(1, len(s) - 1)
    op = rng.randrange(3)
    if op == 0:  # substitution
        c = rng.choice(string.ascii_lowercase)
        return s[:i] + c + s[i + 1 :]
    if op == 1:  # deletion
        return s[:i] + s[i + 1 :]
    return s[:i] + s[i] + s[i:]  # duplication


def _base_name(rng: random.Random, etype: str, idx: int) -> str:
    syll = ["ra", "zo", "mi", "ta", "lek", "vor", "din", "ax", "bru", "cel", "fi", "gor", "han"]
    n = 3 + rng.randrange(2)
    stem = "".join(rng.choice(syll) for _ in range(n)) + str(idx)
    if etype == "gene":
        return stem.upper()
    if etype == "drug":
        return stem + {0: "ol", 1: "ine", 2: "mab"}[rng.randrange(3)]
    if etype == "disease":
        return stem + " " + rng.choice(["syndrome", "disease", "disorder"])
    if etype == "species":
        return stem.capitalize() + " " + rng.choice(["major", "minor", "vulgaris"])
    return stem


def make_entities(rng: random.Random, per_type: int = 40) -> list[Entity]:
    from bern_spark.functions.pytext import levenshtein_sim

    entities: list[Entity] = []
    for etype in _ETYPES:
        taken: list[str] = []
        for i in range(per_type):
            eid = f"{etype[:2]}e{i:04d}"
            if etype == "mutation":
                # tmVar-style normalizedName keys (mutation_normalizer.py:31-38);
                # no lowercase fallback exists for these (J3).
                ref = 101 + 97 * i  # spaced refs: no two within edit dist 1
                a, b = "ACGT"[i % 4], "ACGT"[(i + 1) % 4]
                base = f"c.{ref}{a}>{b}"
                surfaces = [base, base.replace("c.", "c. ")]
                dict_names = [base]
            else:
                # reject base names too similar to an earlier entity of the
                # same type: labeled non-match pairs must be separable by a
                # 0.85 similarity threshold (FIXTURES §5 F1 target).
                while True:
                    base = _base_name(rng, etype, i)
                    if all(levenshtein_sim(base.lower(), t) < 0.62 for t in taken):
                        break
                taken.append(base.lower())
                surfaces = [base]
                dict_names = [base]
                # case variant (species lowercase fallback J2; tmchem key J1)
                surfaces.append(base.lower())
                if etype in ("drug", "disease"):
                    # punctuation/whitespace variant — same tmChem key (J1)
                    v = base.replace(" ", "-") if " " in base else base[:3] + "-" + base[3:]
                    surfaces.append(v)
                    dict_names.append(v)
                if etype == "species":
                    # J2 fallback lowercases only the query
                    # (species_normalizer.py:49-50) — so every 3rd species
                    # is dict'd in lowercase ONLY and reached via the
                    # fallback from its capitalized surface.
                    dict_names = [base.lower()] if i % 3 == 0 else [base]
                if etype == "gene":
                    surfaces.append(base + " gene")  # P8 suffix strip
            # typo variants: extractable, NOT in dict -> resolved by scoring
            # (not for mutations: tmVar-style tagging is pattern-exact and
            # J3 is deliberately fuzzy-free, mutation_normalizer.py:48-49)
            if etype != "mutation":
                surfaces.append(_typo(rng, surfaces[0]))
            # ~15% of entities are absent from normalization dicts entirely:
            # their mentions are all CUI-less and must cluster via similarity.
            oid: str | None
            if etype != "mutation" and i % 7 == 3:
                oid = None
                dict_names = []
            elif etype == "species":
                # numeric oid so taxid = oid // 100 (normalize.py:491)
                oid = str((9000 + i) * 100 + rng.randrange(100))
            else:
                oid = f"{etype.upper()[:4]}:{1000 + i}"
            entities.append(Entity(eid, etype, oid, surfaces, dict_names))
    return entities


def generate(seed: int = 2019, n_convs: int = 200, per_type: int = 40) -> dict[str, list]:
    """Return dict of table_name -> list-of-row-dicts (plain Python; the
    caller turns them into Spark/pandas/duckdb frames)."""
    rng = random.Random(seed)
    entities = make_entities(rng, per_type)
    by_type: dict[str, list[Entity]] = {}
    for e in entities:
        by_type.setdefault(e.etype, []).append(e)

    # --- dictionary tables -------------------------------------------------
    dict_rows: dict[str, list[dict]] = {f"dict_{t}": [] for t in _ETYPES}
    for e in entities:
        if e.oid is None:
            continue
        for name in e.dict_names:
            dict_rows[f"dict_{e.etype}"].append({"oid": e.oid, "name": name})

    # gene auxiliary dicts (3-way cascade normalize.py:584-589): a few gene
    # surfaces resolvable only via oldbest / freq dictionaries.
    genes = by_type["gene"]
    dict_gene_oldbest, dict_gene_freq = [], []
    for g in genes[:6]:
        if g.oid:
            alt = g.surfaces[0] + "L"
            g.surfaces.append(alt)
            dict_gene_oldbest.append({"oid": g.oid, "name": alt})
    for g in genes[6:10]:
        if g.oid:
            alt = g.surfaces[0] + "F"
            g.surfaces.append(alt)
            dict_gene_freq.append({"oid": g.oid, "name": alt})

    # id_merge chains + a cycle (FIXTURES §4): old gene oids -> canonical.
    id_merge = []
    merged_oid_of: dict[str, str] = {}
    for gi, g in enumerate(genes[10:16]):
        if not g.oid:
            continue
        old1, old2 = f"GENE:{8000 + gi}", f"GENE:{8500 + gi}"
        id_merge.append({"src_oid": old2, "dst_oid": old1})  # chain a->b
        id_merge.append({"src_oid": old1, "dst_oid": g.oid})  # b->c
        # some dict entries point at the *old* oid; CC must canonicalize
        alt = g.surfaces[0] + "M"
        g.surfaces.append(alt)
        dict_rows["dict_gene"].append({"oid": old2, "name": alt})
        merged_oid_of[old1] = g.oid
        merged_oid_of[old2] = g.oid
    if genes[16].oid:
        id_merge.append({"src_oid": genes[16].oid, "dst_oid": genes[16].oid})  # self loop

    # metadata tables (normalize.py:97-150), incl. empty ext lists.
    meta = {"meta_gene": [], "meta_disease": [], "meta_drug": []}
    for t, key in (("gene", "meta_gene"), ("disease", "meta_disease"), ("drug", "meta_drug")):
        for i, e in enumerate(by_type[t]):
            if e.oid is None:
                continue
            if i % 5 == 4:
                continue  # absent from meta -> bare BERN id survives
            ext = [] if i % 5 == 3 else [f"EXT{t[:1].upper()}:{i}", f"ALT:{i * 7}"]
            if t == "gene" and i % 4 == 0 and ext:
                ext[0] = "HGNC:HGNC:" + str(i)  # exercises normalize.py:114 fix
            meta[key].append({"oid": e.oid, "ext_ids": ext})

    # species stoplist entities: extractable species surfaces that P5 drops.
    stop_surfaces = rng.sample(SPECIES_STOPLIST, 8)

    # --- transcripts + golden mentions ------------------------------------
    transcripts, golden = [], []
    roles = ["user", "assistant", "tool"]
    tools = [None, "search", "lookup", "calc"]
    base_ts = 1700000000  # fixed epoch base; deterministic
    # conflict pairs: same surface registered under two etypes with distinct
    # deterministic scores (W9 keep-higher, ops.py:232-476) + one tie.
    conflict_surface = "ambigraxol"
    tie_surface = "tievexin"

    for ci in range(n_convs):
        conv_id = f"c{ci:06d}"
        n_turns = 2 + rng.randrange(7)
        for ti in range(n_turns):
            words: list[str] = []
            cursor = 0
            mentions_here = []

            def put(tokens: str):
                nonlocal cursor
                if words:
                    cursor += 1  # joining space
                words.append(tokens)
                start = cursor
                cursor += len(tokens)
                return start

            # leading filler
            for _ in range(2 + rng.randrange(5)):
                put(rng.choice(_FILLER))
            n_m = rng.randrange(4)  # 0..3 mentions
            for _ in range(n_m):
                roll = rng.random()
                if roll < 0.02:
                    surf = conflict_surface
                    start = put(surf)
                    golden.append(dict(conv_id=conv_id, turn_idx=ti, start=start,
                                       end=start + len(surf), mention=surf,
                                       etype="drug", entity_id="conflict_drug"))
                    continue
                if roll < 0.03:
                    surf = tie_surface
                    start = put(surf)
                    for et in ("gene", "drug"):  # tie keeps both (ops.py:292-298)
                        golden.append(dict(conv_id=conv_id, turn_idx=ti, start=start,
                                           end=start + len(surf), mention=surf,
                                           etype=et, entity_id="tie_" + et))
                    continue
                if roll < 0.08:
                    surf = rng.choice(stop_surfaces)  # filtered species
                    put(surf)
                    continue
                e = rng.choice(entities)
                surf = rng.choice(e.surfaces)
                start = put(surf)
                golden.append(dict(conv_id=conv_id, turn_idx=ti, start=start,
                                   end=start + len(surf), mention=surf,
                                   etype=e.etype, entity_id=e.entity_id))
                for _ in range(1 + rng.randrange(3)):
                    put(rng.choice(_FILLER))
            # trailing filler + hazards AFTER the last mention
            for _ in range(1 + rng.randrange(3)):
                put(rng.choice(_FILLER))
            text = " ".join(words)
            if rng.random() < 0.15:  # exotic 1:1 unicode space injection
                flips = [i for i, c in enumerate(text) if c == " "]
                if flips:
                    i = rng.choice(flips)
                    text = text[:i] + rng.choice(_UNICODE_SPACES) + text[i + 1 :]
            if rng.random() < 0.05:  # >50-char word, post-mention (P3)
                text += " " + "x" * (55 + rng.randrange(20))
            transcripts.append(dict(
                conv_id=conv_id, turn_idx=ti, role=roles[ti % 3],
                text=text, tool=rng.choice(tools),
                ts=base_ts + ci * 3600 + ti * 60,
            ))

    # conflict/tie surfaces also live in the extraction lexicon via dicts:
    dict_rows["dict_drug"].append({"oid": "DRUG:9001", "name": conflict_surface})
    dict_rows["dict_gene"].append({"oid": "GENE:9001", "name": conflict_surface})
    dict_rows["dict_drug"].append({"oid": "DRUG:9002", "name": tie_surface})
    dict_rows["dict_gene"].append({"oid": "GENE:9002", "name": tie_surface})

    # --- extraction lexicon (NER stand-in): every extractable surface ------
    # ``weight`` stands in for the reference's mean-softmax NER score
    # (ops.py:219-230); W9 overlap resolution keeps the higher-weight etype
    # for identical spans, ties keep both (ops.py:292-298).
    lexicon = []
    seen = set()
    for e in entities:
        for s in e.surfaces:
            if (e.etype, s) not in seen:
                seen.add((e.etype, s))
                lexicon.append({"etype": e.etype, "surface": s, "weight": 0.8})
    for s in SPECIES_STOPLIST:
        if ("species", s) not in seen:
            lexicon.append({"etype": "species", "surface": s, "weight": 0.8})
    lexicon.append({"etype": "drug", "surface": conflict_surface, "weight": 0.9})
    lexicon.append({"etype": "gene", "surface": conflict_surface, "weight": 0.6})
    lexicon.append({"etype": "drug", "surface": tie_surface, "weight": 0.8})
    lexicon.append({"etype": "gene", "surface": tie_surface, "weight": 0.8})

    # --- labeled pairs for the F1 oracle (FIXTURES §5) ---------------------
    # Pairs share the pipeline's token block key (first-token tmchem key);
    # is_match = same entity. Sampled deterministically.
    from bern_spark.functions.pytext import conll_tokens  # local import, no spark

    def block_key(m):
        toks = conll_tokens(m.lower())
        return "".join(c for c in toks[0] if c.isalnum()) if toks else ""

    mention_ids = {}
    for g in golden:
        mid = f"{g['conv_id']}|{g['turn_idx']}|{g['start']}"
        mention_ids[mid] = g
    by_block: dict[tuple[str, str], list[str]] = {}
    for mid, g in mention_ids.items():
        by_block.setdefault((g["etype"], block_key(g["mention"])), []).append(mid)
    labeled_pairs = []
    prng = random.Random(seed + 1)
    for (etype, bk), mids in sorted(by_block.items()):
        if len(mids) < 2:
            continue
        mids = sorted(mids)
        pool = list(itertools.combinations(mids, 2))
        if len(pool) > 30:
            pool = prng.sample(pool, 30)
        for a, b in pool:
            labeled_pairs.append(dict(
                mention_id_a=a, mention_id_b=b, block_key=f"{etype}:{bk}",
                is_match=mention_ids[a]["entity_id"] == mention_ids[b]["entity_id"],
            ))

    ents_out = [dict(entity_id=e.entity_id, etype=e.etype, oid=e.oid) for e in entities]
    return {
        "transcripts": transcripts,
        "golden_mentions": golden,
        "labeled_pairs": labeled_pairs,
        "lexicon": lexicon,
        "entities": ents_out,
        "id_merge": id_merge,
        "dict_gene_oldbest": dict_gene_oldbest,
        "dict_gene_freq": dict_gene_freq,
        **dict_rows,
        **meta,
    }


def to_spark(spark, tables: dict[str, list], ts_cols=("ts",)):
    """Materialize generator output as Spark DataFrames with explicit schemas."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schemas = {
        "transcripts": T.StructType([
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.LongType()),
        ]),
        "golden_mentions": T.StructType([
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("mention", T.StringType()),
            T.StructField("etype", T.StringType()),
            T.StructField("entity_id", T.StringType()),
        ]),
        "labeled_pairs": T.StructType([
            T.StructField("mention_id_a", T.StringType()),
            T.StructField("mention_id_b", T.StringType()),
            T.StructField("block_key", T.StringType()),
            T.StructField("is_match", T.BooleanType()),
        ]),
        "lexicon": T.StructType([
            T.StructField("etype", T.StringType()),
            T.StructField("surface", T.StringType()),
            T.StructField("weight", T.DoubleType()),
        ]),
        "entities": T.StructType([
            T.StructField("entity_id", T.StringType()),
            T.StructField("etype", T.StringType()),
            T.StructField("oid", T.StringType()),
        ]),
        "id_merge": T.StructType([
            T.StructField("src_oid", T.StringType()),
            T.StructField("dst_oid", T.StringType()),
        ]),
    }
    dict_schema = T.StructType([
        T.StructField("oid", T.StringType()),
        T.StructField("name", T.StringType()),
    ])
    meta_schema = T.StructType([
        T.StructField("oid", T.StringType()),
        T.StructField("ext_ids", T.ArrayType(T.StringType())),
    ])
    out = {}
    for name, rows in tables.items():
        schema = schemas.get(name)
        if schema is None:
            schema = meta_schema if name.startswith("meta_") else dict_schema
        df = spark.createDataFrame(rows, schema=schema)
        if name == "transcripts":
            df = df.withColumn("ts", F.timestamp_seconds(F.col("ts")))
        out[name] = df
    return out
