"""CLI front door: the reference's upload workflow from a terminal.

    python -m excel_to_database_spark upload book.xlsx [--sheet S] [--tenant T]
    python -m excel_to_database_spark upload data.csv  [--tenant T]
    python -m excel_to_database_spark query "SELECT ... FROM x_excel.t"
    python -m excel_to_database_spark export x_excel.t out.xlsx

Uses the local catalog destination (parquet ``saveAsTable``); the same
calls accept a JdbcDestination for warehouse targets via the library
API (excel_to_database_spark.api)."""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="excel_to_database_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    up = sub.add_parser("upload", help="sync a workbook/CSV into the catalog")
    up.add_argument("path")
    up.add_argument("--sheet", default=None, help="sheet name (default: all sheets)")
    up.add_argument("--tenant", default=None, help="schema suffix (x_excel_<tenant>)")
    up.add_argument("--visible-only", action="store_true")

    q = sub.add_parser("query", help="run SQL against the catalog")
    q.add_argument("sql")
    q.add_argument("--limit", type=int, default=20)

    ex = sub.add_parser("export", help="export a table to .xlsx")
    ex.add_argument("table")
    ex.add_argument("out")

    args = ap.parse_args(argv)

    import os

    from excel_to_database_spark.naming import sqlify
    from excel_to_database_spark.session import get_session

    # persistent catalog so separate CLI invocations see the same tables
    # (the default in-memory catalog dies with the process)
    home = os.path.expanduser(os.environ.get("ETDS_HOME", "~/.excel_to_database_spark"))
    spark = get_session(
        "etds-cli",
        extra_conf={
            "spark.sql.catalogImplementation": "hive",
            "spark.sql.warehouse.dir": f"{home}/warehouse",
            "spark.hadoop.javax.jdo.option.ConnectionURL": (
                f"jdbc:derby:;databaseName={home}/metastore_db;create=true"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "upload":
        from excel_to_database_spark.sources.csv_source import read_csv_path
        from excel_to_database_spark.sources.excel_source import read_excel, sheet_names
        from excel_to_database_spark.sync import sync_table

        if args.path.endswith(".xlsx"):
            sheets = [args.sheet] if args.sheet else sheet_names(args.path)
            for sheet in sheets:
                df = read_excel(spark, args.path, sheet=sheet, visible_only=args.visible_only)
                print(sync_table(df, sqlify(sheet), path=args.tenant).message())
        else:
            import os

            df = read_csv_path(spark, args.path)
            table = sqlify(os.path.splitext(os.path.basename(args.path))[0])
            print(sync_table(df, table, path=args.tenant).message())
    elif args.cmd == "query":
        spark.sql(args.sql).show(args.limit, truncate=False)
    elif args.cmd == "export":
        from excel_to_database_spark.sources.xlsx_writer import write_excel

        df = spark.table(args.table)
        str_df = df.selectExpr(*[f"CAST(`{c}` AS STRING) AS `{c}`" for c in df.columns])
        n = write_excel(str_df, args.out, sheet_name=args.table.split(".")[-1])
        print(f"Wrote {n} rows to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
