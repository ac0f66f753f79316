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
  user's hash) -> the nullif guard's NULL path on both engines.

Usage: python3 tools/gen_adversarial.py <src_sf_dir> <out_dir>
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SIXTY_Y = pd.Timedelta(days=60 * 365)
FORTY_Y = pd.Timedelta(days=40 * 365)
HUNDRED_Y = pd.Timedelta(days=100 * 365)


def main(src, out):
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
        else:
            shutil.copyfile(sp, op)
    print(f"adversarial fixture written to {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
