#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, and compares schema + sorted rows. Exit 1 on any mismatch.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_result(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])

def normalize(table):
    # sort columns by name, then rows by everything (as python tuples)
    cols = sorted(table.column_names)
    table = table.select(cols)
    rows = [tuple(str(v) for v in row) for row in zip(*[table.column(c).to_pylist() for c in cols])]
    rows.sort()
    return cols, [str(table.schema.field(c).type) for c in cols], rows

def fresh_con(sf_dir):
    con = duckdb.connect()
    # bounded footprint: 32 default threads x ~200 queries accumulate
    # allocator arenas/maps in one process and late queries die with
    # bad_alloc at KB sizes despite ~120 GB free; 8 threads is plenty
    # at sf<=0.01 oracle scale
    con.execute("SET threads=8")
    con.execute("SET memory_limit='16GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con

def run_oracle(sf_dir, sql):
    # one retry on allocator exhaustion: transient (observed under a
    # concurrent 32-thread JVM), and a retried query either passes or
    # fails deterministically on content
    for attempt in (1, 2):
        con = fresh_con(sf_dir)
        try:
            return con.execute(sql).fetch_arrow_table()
        except Exception as e:
            if attempt == 2 or "Out of Memory" not in str(e):
                raise
        finally:
            con.close()

def run_oracle_isolated(sf_dir, sql):
    # last-resort escape hatch for allocator exhaustion the in-process
    # retry cannot cure (glibc arena state is process-wide): run the
    # ONE query in a fresh python/duckdb subprocess, hand the result
    # back as parquet. Flaky KB-sized bad_allocs with ~120 GB free
    # were observed even in 3-query chunk processes; a per-query
    # process either passes or fails deterministically on content.
    import subprocess, tempfile
    fd, out = tempfile.mkstemp(suffix=".parquet")
    os.close(fd)
    helper = (
        "import duckdb, sys\n"
        "sf, out = sys.argv[1], sys.argv[2]\n"
        "con = duckdb.connect()\n"
        "con.execute('SET threads=8')\n"
        "con.execute(\"SET memory_limit='16GB'\")\n"
        f"for t in {TABLES!r}:\n"
        "    con.execute('CREATE VIEW ' + t + \" AS SELECT * FROM \"\n"
        "        \"read_parquet('\" + sf + '/' + t + \".parquet')\")\n"
        "sql = sys.stdin.read()\n"
        "con.execute('COPY (' + sql + ') TO ' + chr(39) + out + chr(39)\n"
        "    + ' (FORMAT parquet)')\n")
    subprocess.run([sys.executable, "-c", helper, sf_dir, out],
                   input=sql.encode(), check=True)
    try:
        return pq.read_table(out)
    finally:
        os.unlink(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # CHUNKED re-exec: one long-lived python/duckdb process accumulates
    # allocator state across ~200 oracle queries and eventually dies
    # with bad_alloc on KB-sized blocks (and once a segfault) with
    # ~120 GB free — per-connection hygiene did not cure it, process
    # isolation does. With no explicit query filter, split the run
    # into chunks of 25 queries, each in a fresh subprocess.
    if not only and len(oracle) > 25:
        import subprocess
        names = sorted(oracle)
        failures = 0
        for i in range(0, len(names), 25):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir, out_dir]
                + names[i:i + 25])
            failures += 1 if r.returncode else 0
        # rows-only listing (queries with no oracle), once at the end
        for d in sorted(os.listdir(out_dir)):
            p = os.path.join(out_dir, d)
            if os.path.isdir(p) and d not in oracle:
                rt = load_result(p)
                n = rt.num_rows if rt is not None else "MISSING"
                print(f"INFO {d}: rows-only check, rows={n}")
        sys.exit(1 if failures else 0)
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res = load_result(os.path.join(out_dir, name))
        if res is None:
            print(f"FAIL {name}: no spark result written"); failures += 1; continue
        try:
            # fresh connection per query: one shared connection
            # accumulates allocator state across ~200 queries and dies
            # with bad_alloc on the sort-late tail of the run (observed:
            # 2KB allocation failures with 120 GB free)
            exp = run_oracle(sf_dir, oracle[name])
        except Exception as e:
            if "Out of Memory" in str(e):
                # escape to a fresh process (see run_oracle_isolated)
                try:
                    exp = run_oracle_isolated(sf_dir, oracle[name])
                except Exception as e2:
                    print(f"FAIL {name}: oracle error (isolated retry): {e2}")
                    failures += 1
                    continue
            else:
                print(f"FAIL {name}: oracle error: {e}"); failures += 1
                continue
        gc, gt, gr = normalize(res)
        ec, et, er = normalize(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}"); failures += 1; continue
        if gt != et:
            print(f"WARN {name}: types {list(zip(gc, gt, et))}")
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs oracle {len(er)}"); failures += 1; continue
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
            failures += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
    # queries without oracle (skipped under an explicit filter — chunk
    # children would duplicate the listing per chunk)
    if not only:
        for d in sorted(os.listdir(out_dir)):
            p = os.path.join(out_dir, d)
            if os.path.isdir(p) and d not in oracle:
                r = load_result(p)
                n = r.num_rows if r is not None else "MISSING"
                print(f"INFO {d}: rows-only check, rows={n}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
