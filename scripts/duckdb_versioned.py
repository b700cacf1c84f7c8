#!/usr/bin/env python3
"""Second-engine reader for a graft versioned (manifest) table root.

Proves the table format is externally consumable the way the reference's
HMS+Trino pairing makes its Iceberg tables: any engine that can read
parquet can resolve a graft table with three metadata reads and no Spark
— the same property Iceberg's spec buys the reference.

Resolution protocol (mirrors graft.sources.ManifestTable's layout doc):
  1. <root>/_CURRENT                 -> live version id N (single text key)
  2. <root>/manifests/v=N.txt        -> '#k=v' property lines, then shard
                                        references '@key\\tshardRel\\tn\\text'
                                        (read <root>/manifests/<shardRel>,
                                        one entry line each) and/or inline
                                        entry lines 'rel[\\tstats]'
  3. <root>/data/<rel>               -> immutable parquet/orc/avro files;
                                        entries under '__deletes/' are
                                        positional-delete tombstones
                                        (__file rel path, __pos row index)
                                        to anti-join out of the data.

Partition-directory values ('__day=D', '__part=P', identity 'col=v')
re-derive exactly as hive-style partitioning, which DuckDB understands
natively via hive_partitioning=1.

Usage:
  python3 scripts/duckdb_versioned.py <table_root> [SQL over view 't']
  python3 scripts/duckdb_versioned.py <table_root> --version N [SQL]

Default SQL: SELECT COUNT(*) AS n_rows FROM t
"""
import sys

import duckdb


def resolve(root: str, version=None):
    """Return (data_paths, delete_paths) for the requested snapshot."""
    if version is None:
        with open(f"{root}/_CURRENT") as f:
            version = int(f.read().strip())
    with open(f"{root}/manifests/v={version}.txt") as f:
        lines = [l.rstrip("\n") for l in f]
    rels = []
    for l in lines:
        if not l or l.startswith("#"):
            continue
        if l.startswith("@"):  # manifest-list shard reference
            shard_rel = l[1:].split("\t")[1]
            with open(f"{root}/manifests/{shard_rel}") as s:
                rels += [sl.rstrip("\n").split("\t")[0]
                         for sl in s if sl.strip()]
        else:
            rels.append(l.split("\t")[0])
    data = [f"{root}/data/{r}" for r in rels if not r.startswith("__deletes/")]
    dels = [f"{root}/data/{r}" for r in rels if r.startswith("__deletes/")]
    return version, data, dels


def open_table(con, root: str, version=None) -> int:
    version, data, dels = resolve(root, version)
    if not data:
        raise SystemExit(f"no data files in v={version} of {root}")
    fmt = data[0].rsplit(".", 1)[-1]
    reader = {"parquet": "read_parquet", "avro": "read_avro"}.get(fmt)
    if reader is None:
        raise SystemExit(f"duckdb cannot read .{fmt} data files here")
    def sql_list(paths):
        return "[" + ", ".join("'" + p.replace("'", "''") + "'" for p in paths) + "]"
    # hidden partition dirs (__day=/__part=) and identity columns re-derive
    # through hive partitioning; row identity for tombstones is
    # (path after .../data/, file row index)
    con.execute(
        f"CREATE VIEW t_raw AS SELECT *, "
        f"regexp_extract(filename, '.*/data/(.*)$', 1) AS __mor_rel, "
        f"file_row_number AS __mor_pos "
        f"FROM {reader}({sql_list(data)}, hive_partitioning=1, filename=1, "
        f"file_row_number=1)")
    if dels:
        con.execute(
            "CREATE VIEW t AS SELECT * EXCLUDE (__mor_rel, __mor_pos) "
            f"FROM t_raw WHERE NOT EXISTS (SELECT 1 FROM read_parquet({sql_list(dels)}) d "
            "WHERE d.__file = t_raw.__mor_rel AND d.__pos = t_raw.__mor_pos)")
    else:
        con.execute(
            "CREATE VIEW t AS SELECT * EXCLUDE (__mor_rel, __mor_pos) FROM t_raw")
    return version


def main() -> None:
    args = sys.argv[1:]
    if not args:
        raise SystemExit(__doc__)
    root = args.pop(0)
    version = None
    if args[:1] == ["--version"]:
        args.pop(0)
        version = int(args.pop(0))
    sql = args[0] if args else "SELECT COUNT(*) AS n_rows FROM t"
    con = duckdb.connect()
    v = open_table(con, root, version)
    print(f"-- {root} @ v={v}")
    print(con.execute(sql).df().to_string(index=False))


if __name__ == "__main__":
    main()
