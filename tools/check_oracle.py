import duckdb, json, glob, sys, math
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_m3"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
        sdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        o = odf[sorted(odf.columns)]
        s = sdf[sorted(sdf.columns)]
        if list(o.columns) != list(s.columns):
            fails.append((name, f"cols {list(o.columns)} vs {list(s.columns)}")); continue
        if len(o) != len(s):
            fails.append((name, f"rows {len(o)} vs {len(s)}")); continue
        ov, sv = o.values.tolist(), s.values.tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(ov, sv)) if str(a) != str(b)]
        if bad:
            fails.append((name, f"{len(bad)} mismatched rows, first: {bad[0]}"))
        else:
            print(f"OK   {name} ({len(o)} rows)")
    except Exception as e:
        fails.append((name, f"ERROR {e}"))
for name, msg in fails: print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} matched")
