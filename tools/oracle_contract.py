#!/usr/bin/env python3
"""Oracle contract check, the DuckDB half: for every oracle in the
given oracle_sql.json, run it against the parquet tables in <sfDir>
and emit one JSON object on stdout:

  {"<name>": {"rows": N, "bad_types": [["col", "TYPE"], ...]}, ...}

with "error" instead of "rows" when the SQL fails to parse/execute.
bad_types flags the HUGEINT family — the one DuckDB output group
pandas cannot materialize with a Spark-matching dtype, so it breaks
the driver's value hash even on numerically identical results (the
q212 rounds-12/13 failure).

Invoked by graft.OracleContractSpec (sbt test) and usable standalone:
  python3 tools/oracle_contract.py <sfDir> <oracleJsonPath>
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

FORBIDDEN_DUCK_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracles.items()):
        entry = {}
        try:
            desc = con.sql("DESCRIBE " + sql).df()
            entry["bad_types"] = [
                [r["column_name"], r["column_type"]]
                for _, r in desc.iterrows()
                if r["column_type"].split("(")[0].strip()
                in FORBIDDEN_DUCK_TYPES]
            entry["rows"] = con.sql(
                f"SELECT count(*) FROM ({sql})").fetchone()[0]
        except Exception as e:
            # braces would break OracleContractSpec's fixed-shape JSON
            # parse and surface as a misleading "not reported" failure
            msg = str(e).split("\n")[0][:500]
            entry["error"] = msg.replace("{", "(").replace("}", ")")
        out[name] = entry
    json.dump(out, sys.stdout)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
