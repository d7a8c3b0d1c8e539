"""Scale a testdata sf directory by an integer factor (default 10x) via
key-shifted copies — deterministic, pure SQL, join cardinalities
preserved (every foreign key shifts by the same per-domain offset as its
referenced key). region/nation are dimensions and stay as-is.

Usage: python tools/make_sf.py [src_dir] [dst_dir] [factor]
e.g.   python tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> (primary key to shift, {fk column -> key domain table})
SHIFTS: dict[str, tuple[str | None, dict[str, str]]] = {
    "region": (None, {}),
    "nation": (None, {}),
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        None,
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {"user_id": "__users"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}

KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
}


def _mirror_types(src_path: str, dst_path: str) -> None:
    """Re-encode ``dst_path`` so every column carries the SOURCE's exact
    arrow type. DuckDB's parquet writer normalizes timestamps to
    microseconds without the UTC flag, so a scaled events.ts would read
    back in Spark as TIMESTAMP_NTZ instead of the driver testdata's
    nanos-as-long — a different dtype than the fixtures the driver
    grades against. Casting us->ns is exact (x1000), and sub-microsecond
    precision was already gone in both engines' read paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src_schema = pq.read_schema(src_path)
    tbl = pq.read_table(dst_path)
    fields = []
    changed = False
    for f in tbl.schema:
        sf = (
            src_schema.field(f.name)
            if src_schema.get_field_index(f.name) >= 0
            else f
        )
        if sf.type != f.type and pa.types.is_timestamp(sf.type):
            fields.append(pa.field(f.name, sf.type, f.nullable))
            changed = True
        else:
            fields.append(f)
    if changed:
        pq.write_table(tbl.cast(pa.schema(fields)), dst_path)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    con = duckdb.connect()
    con.execute("SET timezone = 'UTC'")
    offsets: dict[str, int] = {}
    for t, key in KEY_OF.items():
        offsets[t] = con.execute(
            f"SELECT max({key}) + 1 FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
    offsets["__users"] = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]

    for t, (pk, fks) in SHIFTS.items():
        src_path, dst_path = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        cols = [
            r[0]
            for r in con.execute(
                f"describe select * from read_parquet('{src_path}')"
            ).fetchall()
        ]
        if pk is None and not fks:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_path}')) TO '{dst_path}'"
            )
            _mirror_types(src_path, dst_path)
            continue
        own_off = con.execute(
            f"SELECT max({pk}) + 1 FROM read_parquet('{src_path}')"
        ).fetchone()[0] if pk else None
        exprs = []
        for c in cols:
            if pk is not None and c == pk:
                exprs.append(f"{c} + i * {own_off} AS {c}")
            elif c in fks:
                exprs.append(f"{c} + i * {offsets[fks[c]]} AS {c}")
            else:
                exprs.append(c)
        con.execute(
            f"""COPY (
              SELECT {', '.join(exprs)}
              FROM read_parquet('{src_path}'),
                   unnest(generate_series(0, {factor - 1})) AS g(i)
              ) TO '{dst_path}'"""
        )
        _mirror_types(src_path, dst_path)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst_path}')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
