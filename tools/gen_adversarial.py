#!/usr/bin/env python3
"""Adversarial fixture for the cross-engine floor-division gate (dev-only).

Derives /tmp-style fixture dir from a real sf dir with the input classes
the standard fixtures never contain, so the DuckDB compare exercises the
divergence-prone paths end to end:

- pre-epoch timestamps: every user_id % 5 == 0 has ALL events shifted
  back 60 years (whole-user shift keeps intra-user ordering/sessions
  sane) -> negative epoch days through every epoch-day bucketing;
- refunds: value negated on event_id % 11 == 0 -> negative daily cent /
  micro sums through q162/q168/q201 etc.;
- dirty order dates: o_orderkey % 13 == 0 shifted back 40 years
  (pre-epoch o_orderdate for q150/q156/q208), % 17 == 0 shifted forward
  100 years (ship-before-order -> NEGATIVE q219 delays);
- a one-arm event type: one fresh user with event_type 'zz_adv_onearm',
  so q189's A/B split has an empty arm (na=0 or nb=0 depending on the
  user's hash) -> the nullif guard's NULL path on both engines;
- hostile documents (appended, fresh doc_ids): empty / whitespace-only
  text, NFC-vs-NFD accents, emoji + flags, space-free CJK, a 5000-char
  single token, regex metacharacters, RTL Arabic/Hebrew, CRLF + repeated
  lines, punctuation spam, digit soup, exact duplicates (of an existing
  doc and of another adversarial doc) -> tokenizers, n-gram shingles,
  entropy/quality scores, line dedup, langid, and every dedup tier on
  inputs real crawls actually contain;
- hostile embeddings (appended, fresh vec_ids): the all-zero vector
  (zero norm -> cosine 0/0), exact-duplicate pairs (cosine ties ->
  rank tie-break determinism), a duplicate of an existing vector, and
  near-float32-max / subnormal magnitudes (precision at the format's
  edge). Under --nan, two more rows: TRUE float32 NaN components and
  NULL components (distinct classes — see nan_embeddings) exercising
  the sanity gate's NaN and IS NULL arms and q197's n_bad reporting.

Usage: python3 tools/gen_adversarial.py <src_sf_dir> <out_dir> [--nan]
"""
import sys, os, shutil, unicodedata
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SIXTY_Y = pd.Timedelta(days=60 * 365)
FORTY_Y = pd.Timedelta(days=40 * 365)
HUNDRED_Y = pd.Timedelta(days=100 * 365)


ADV_TEXTS = [
    ("empty", ""),
    ("whitespace", "   \t\t \n\n  "),
    ("nfc", "café résumé naïve touché café"),
    ("nfd", "café résumé naïve touché café"),
    ("emoji", "\U0001F680 rocket \U0001F680\U0001F680 launch "
              "\U0001F1FA\U0001F1F8 flag done"),
    ("cjk", "東京都に住んでいます"
            "。日本語のテキストで"
            "す。形態素解析は難し"
            "い。"),
    ("longtoken", "a" * 5000 + " end"),
    ("regexmeta", "a.b*c?(d)[e]{2}|f\\g ^h$ i+j $1 \\k"),
    ("rtl", "مرحبا بالعا"
            "لم שלום עולם"
            " hello mixed"),
    ("crlf", "line one\r\nline one\r\nline two\r\n\r\n\r\nline two\r\nend"),
    ("punctspam", "!!! ??? ... ,,, ;;; ::: !!! ??? ..."),
    ("digits", "123 456 789 123 456 0.5 1e10 -42 3.14159 123"),
    # full-vs-simple Unicode case mappings: Java (Spark) lowers
    # U+0130 to i + combining dot and applies contextual final sigma;
    # utf8proc (DuckDB) simple-maps both. Any query folding case with
    # an engine's locale tables diverges on this doc (q103 folds
    # ASCII-only for exactly this reason).
    ("casefold", "İstanbul ΣΊΣΥΦΟ"
                 "Σ STRASSE ß ẞ MiXeD Case"),
]


def adv_documents(df):
    """Appended hostile docs: the ADV_TEXTS classes + exact duplicates
    (of doc 0 and of the nfc doc) for the dedup tiers. n_chars follows
    the fixture invariant n_chars == length(text) in code points."""
    base = int(df.doc_id.max()) + 1
    rows = []
    for i, (_tag, text) in enumerate(ADV_TEXTS):
        rows.append({"doc_id": base + i, "text": text, "lang": "en",
                     "source": "src_adv", "n_chars": len(text)})
    first = df.sort_values("doc_id").iloc[0]  # any existing doc works
    dup0 = str(first.text)
    rows.append({"doc_id": base + len(ADV_TEXTS), "text": dup0,
                 "lang": str(first.lang),
                 "source": "src_adv", "n_chars": len(dup0)})
    nfc = ADV_TEXTS[2][1]
    rows.append({"doc_id": base + len(ADV_TEXTS) + 1, "text": nfc,
                 "lang": "en", "source": "src_adv", "n_chars": len(nfc)})
    return pd.DataFrame(rows)


def adv_embeddings(df, dims):
    """Appended hostile vectors: zero norm, exact-duplicate pair, a copy
    of vec 100, near-float32-max and subnormal magnitudes."""
    base = int(df.vec_id.max()) + 1
    unit = [1.0] + [0.0] * (dims - 1)
    # duplicate SOME existing vector (the last by id — present in any
    # source fixture, unlike a hard-coded id)
    dup100 = list(df.sort_values("vec_id").embedding.iloc[-1])
    vecs = [
        [0.0] * dims,                       # zero norm -> cosine 0/0
        [0.25] * dims,                      # duplicate pair member A
        [0.25] * dims,                      # duplicate pair member B
        dup100,                             # exact copy of vec 100
        [3.0e38] * dims,                    # near float32 max
        [1.0e-40] * dims,                   # float32 subnormal
        unit,                               # axis vector (exact 0 dots)
    ]
    rows = [{"vec_id": base + i, "embedding": v, "label": i % 10}
            for i, v in enumerate(vecs)]
    return pd.DataFrame(rows)


def nan_embeddings(base, dims, schema):
    """--nan probe rows, built in raw pyarrow because pandas coerces
    NaN to null on the way in: one vector with TRUE float32 NaN
    components and one with NULL components — distinct hostile classes
    (NaN fails abs(x) <= 10 on both engines; NULL needs the explicit
    IS NULL arm of the sanity gate, since DuckDB's list_filter drops
    NULL-predicate elements and list_inner_product then aborts)."""
    nanvec = [float("nan")] * 4 + [0.5] * (dims - 4)
    nullvec = [None] * 4 + [0.5] * (dims - 4)
    cols = {
        "vec_id": pa.array([base, base + 1],
                           type=schema.field("vec_id").type),
        "embedding": pa.array([nanvec, nullvec],
                              type=schema.field("embedding").type,
                              from_pandas=False),
        "label": pa.array([3, 4], type=schema.field("label").type),
    }
    return pa.table({n: cols[n] for n in schema.names})


def main(src, out, with_nan=False):
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        op = os.path.join(out, f"{t}.parquet")
        if t == "events":
            schema = pq.read_schema(sp).remove_metadata()
            df = pq.read_table(sp).to_pandas()
            pre = df.user_id % 5 == 0
            df.loc[pre, "ts"] = df.loc[pre, "ts"] - SIXTY_Y
            df.loc[df.event_id % 11 == 0, "value"] *= -1.0
            extra = pd.DataFrame([{
                "event_id": int(df.event_id.max()) + 1,
                "ts": df.ts.max(),
                "user_id": int(df.user_id.max()) + 1,
                "event_type": "zz_adv_onearm",
                "value": 7.5,
                "props": "{}",
            }])
            df = pd.concat([df, extra], ignore_index=True)
            pq.write_table(
                pa.Table.from_pandas(df, schema=schema, preserve_index=False),
                op)
        elif t == "orders":
            schema = pq.read_schema(sp).remove_metadata()
            df = pq.read_table(sp).to_pandas()
            df.loc[df.o_orderkey % 13 == 0, "o_orderdate"] -= FORTY_Y
            df.loc[df.o_orderkey % 17 == 0, "o_orderdate"] += HUNDRED_Y
            pq.write_table(
                pa.Table.from_pandas(df, schema=schema, preserve_index=False),
                op)
        elif t == "documents":
            schema = pq.read_schema(sp).remove_metadata()
            df = pq.read_table(sp).to_pandas()
            df = pd.concat([df, adv_documents(df)], ignore_index=True)
            pq.write_table(
                pa.Table.from_pandas(df, schema=schema, preserve_index=False),
                op)
        elif t == "embeddings":
            schema = pq.read_schema(sp).remove_metadata()
            df = pq.read_table(sp).to_pandas()
            dims = len(df.embedding.iloc[0])
            df = pd.concat([df, adv_embeddings(df, dims)],
                           ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=schema,
                                       preserve_index=False)
            if with_nan:
                tbl = pa.concat_tables(
                    [tbl, nan_embeddings(int(df.vec_id.max()) + 1,
                                         dims, schema)])
            pq.write_table(tbl, op)
        else:
            shutil.copyfile(sp, op)
    print(f"adversarial fixture written to {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], with_nan="--nan" in sys.argv[3:])
