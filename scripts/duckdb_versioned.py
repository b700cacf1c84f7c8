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
                                        delete files: positional tombstones
                                        (__file rel path, __pos row index),
                                        or — named 'eq_*' — EQUALITY keys
                                        retracting every matching row of
                                        data files with a strictly smaller
                                        'seq=N' commit sequence (third
                                        TAB field of an entry line),
                                        or — named 'dv_*.bin' — a DELETION
                                        VECTOR: one binary blob holding the
                                        positions of many target files. The
                                        entry's stats field carries the
                                        index 'dv=<urlencoded rel>:<offset>
                                        :<length>:<seq>[:<count>],...' (the
                                        optional count is the section's
                                        exact tombstone cardinality, for
                                        planning); each section
                                        is unsigned-LEB128 varints: a count
                                        then delta-encoded sorted positions
                                        (first absolute, rest gaps).

Partition-directory values ('__day=D', '__part=P', identity 'col=v')
re-derive exactly as hive-style partitioning, which DuckDB understands
natively via hive_partitioning=1.

Shallow clones: an entry rel prefixed 'ext/' lives in ANOTHER table's
pool — the source data directory is the single line of the immutable
<root>/_clone_src sidecar; resolve 'ext/<rel>' as '<clone_src>/<rel>'
(everything after the prefix keeps the source's layout, partition dirs
included).

Usage:
  python3 scripts/duckdb_versioned.py <table_root> [SQL over view 't']
  python3 scripts/duckdb_versioned.py <table_root> --version N [SQL]

Default SQL: SELECT COUNT(*) AS n_rows FROM t
"""
import os
import sys

import duckdb


def _parse_line(line):
    """(rel, seq, stats) of one entry line ('rel[\\tstats][\\tseq=N]')."""
    f = line.split("\t")
    seq = 0
    stats = ""
    for tok in f[1:]:
        if tok.startswith("seq="):
            seq = int(tok[4:])
        elif tok:
            stats = tok
    return f[0], seq, stats


def _dv_positions(blob_path, stats):
    """Decode a deletion vector's (target rel, position) pairs from its
    'dv=' index and LEB128 delta sections — pure Python, no parquet."""
    from urllib.parse import unquote
    out = []
    with open(blob_path, "rb") as f:
        blob = f.read()
    for tok in stats[3:].split(","):
        if not tok:
            continue
        # <rel>:<offset>:<len>:<seq>[:<count>] — count is the optional
        # exact tombstone cardinality newer writers record for planning
        parts = tok.split(":")
        rel_enc, off, length = parts[0], parts[1], parts[2]
        rel = unquote(rel_enc)
        i = int(off)
        end = i + int(length)

        def varint():
            nonlocal i
            v, shift = 0, 0
            while True:
                b = blob[i]
                i += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    return v
                shift += 7

        n = varint()
        pos = 0
        for j in range(n):
            pos += varint()
            out.append((rel, pos))
        assert i == end, f"dv section of {rel} mis-sized"
    return out


def resolve(root: str, version=None):
    """Return (entries, pos_delete_paths, eq_deletes) for the snapshot;
    entries are (path, seq) pairs, eq_deletes are (path, seq)."""
    if version is None:
        with open(f"{root}/_CURRENT") as f:
            version = int(f.read().strip())
    with open(f"{root}/manifests/v={version}.txt") as f:
        lines = [l.rstrip("\n") for l in f]
    entries = []
    for l in lines:
        if not l or l.startswith("#"):
            continue
        if l.startswith("@"):  # manifest-list shard reference
            shard_rel = l[1:].split("\t")[1]
            with open(f"{root}/manifests/{shard_rel}") as s:
                entries += [_parse_line(sl.rstrip("\n")) for sl in s if sl.strip()]
        else:
            entries.append(_parse_line(l))
    # shallow clones: an `ext/` rel resolves into the SOURCE pool named
    # by the immutable _clone_src sidecar (protocol: one external base)
    clone_src = None
    if os.path.exists(f"{root}/_clone_src"):
        with open(f"{root}/_clone_src") as f:
            clone_src = f.read().strip()

    def path_of(rel):
        if rel.startswith("ext/"):
            assert clone_src, f"{root} has ext/ entries but no _clone_src"
            return f"{clone_src}/{rel[4:]}"
        return f"{root}/data/{rel}"

    def plain(rel):
        return rel[4:] if rel.startswith("ext/") else rel

    data = [(path_of(r), q) for r, q, _ in entries
            if not plain(r).startswith("__deletes/")]
    pos = [path_of(r) for r, q, _ in entries
           if plain(r).startswith("__deletes/")
           and not plain(r).startswith("__deletes/eq_")
           and not plain(r).startswith("__deletes/dv_")]
    eq = [(path_of(r), q) for r, q, _ in entries
          if plain(r).startswith("__deletes/eq_")]
    dv = []
    for r, q, stats in entries:
        if plain(r).startswith("__deletes/dv_"):
            dv += _dv_positions(path_of(r), stats)
    return version, data, pos, eq, dv


def open_table(con, root: str, version=None) -> int:
    version, data, pos, eq, dv = resolve(root, version)
    if not data:
        raise SystemExit(f"no data files in v={version} of {root}")
    fmt = data[0][0].rsplit(".", 1)[-1]
    reader = {"parquet": "read_parquet", "avro": "read_avro"}.get(fmt)
    if reader is None:
        raise SystemExit(f"duckdb cannot read .{fmt} data files here")
    def sql_list(paths):
        return "[" + ", ".join("'" + p.replace("'", "''") + "'" for p in paths) + "]"
    # hidden partition dirs (__day=/__part=) and identity columns re-derive
    # through hive partitioning; row identity for tombstones is
    # (path after .../data/, file row index); the per-row commit sequence
    # scopes equality deletes
    seq_case = " ".join(
        f"WHEN filename = '{p}' THEN {q}" for p, q in data) or "WHEN 1=0 THEN 0"
    con.execute(
        f"CREATE VIEW t_raw AS SELECT *, "
        f"regexp_extract(filename, '.*/data/(.*)$', 1) AS __mor_rel, "
        f"file_row_number AS __mor_pos, "
        f"CASE {seq_case} ELSE 0 END AS __row_seq "
        f"FROM {reader}({sql_list([p for p, _ in data])}, hive_partitioning=1, "
        f"filename=1, file_row_number=1)")
    conds = []
    if pos:
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM read_parquet({sql_list(pos)}) d "
            "WHERE d.__file = t_raw.__mor_rel AND d.__pos = t_raw.__mor_pos)")
    if dv:  # deletion-vector tombstones decoded above, as an inline table
        con.execute("CREATE TEMP TABLE dv_tomb (__file VARCHAR, __pos BIGINT)")
        con.executemany("INSERT INTO dv_tomb VALUES (?, ?)", dv)
        conds.append(
            "NOT EXISTS (SELECT 1 FROM dv_tomb d "
            "WHERE d.__file = t_raw.__mor_rel AND d.__pos = t_raw.__mor_pos)")
    for p, q in eq:  # eq keys: one NOT EXISTS per key file, null-safe match
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()]
        match = " AND ".join(
            f"d.{c} IS NOT DISTINCT FROM t_raw.{c}" for c in cols)
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM read_parquet('{p}') d "
            f"WHERE {match} AND t_raw.__row_seq < {q})")
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    con.execute(
        "CREATE VIEW t AS SELECT * EXCLUDE (__mor_rel, __mor_pos, __row_seq) "
        f"FROM t_raw{where}")
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
