#!/usr/bin/env python3
"""Run the reference pandas ETL pipeline end-to-end on a raw dir and print
one JSON timing line. Imports the reference module read-only and calls its
five public stages exactly as its __main__ does.

Usage: baseline_pandas.py <raw_dir> <out_dir>
"""
import importlib.util
import json
import sys
import time


def main(raw: str, out: str) -> None:
    spec = importlib.util.spec_from_file_location(
        "etl_functions", "/root/reference/src/etl_functions.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    t0 = time.time()
    raw_data = m.extract_data(raw.rstrip("/") + "/")
    transformed = m.transform_data(raw_data)
    dims, fact = m.create_dimensional_model(transformed)
    aggs = m.create_aggregated_tables(fact, dims)
    m.export_to_power_bi(dims, fact, aggs, out.rstrip("/") + "/")
    secs = time.time() - t0
    print(json.dumps({"pandas_sec": round(secs, 3), "fact_rows": len(fact)}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
