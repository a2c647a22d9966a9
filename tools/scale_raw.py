#!/usr/bin/env python3
"""Scale the reference's raw Olist CSVs by an integer factor K.

Each replica suffixes every entity id with _r{k} so keys stay distinct and
join fan-outs match the original shape (same orders-per-customer,
items-per-order distributions); timestamps are left untouched so the date
dimension keeps its range. Replica 0 keeps the original ids.

Replicas append to the output CSV in batches of 1000 so memory stays flat
regardless of K — the all-in-memory concat version topped out around
10,000x (the r2 ceiling); K=100,000 (~9.5 GB) streams fine.

Usage: scale_raw.py <src_raw_dir> <out_dir> <K>
"""
import sys

import pandas as pd

ID_COLS = {
    "olist_customers_dataset.csv": ["customer_id", "customer_unique_id"],
    "olist_orders_dataset.csv": ["order_id", "customer_id"],
    "olist_order_items_dataset.csv": ["order_id", "product_id", "seller_id"],
    "olist_order_reviews_dataset.csv": ["review_id", "order_id"],
    "olist_products_dataset.csv": ["product_id"],
    "olist_sellers_dataset.csv": ["seller_id"],
    "product_category_name_translation.csv": [],
}

BATCH = 1000  # replicas buffered per append


def main(src: str, out: str, k: int) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    for fname, id_cols in ID_COLS.items():
        df = pd.read_csv(f"{src}/{fname}", dtype=str, keep_default_na=False)
        if not id_cols:  # shared lookup table, never replicated
            df.to_csv(f"{out}/{fname}", index=False)
            print(f"{fname}: {len(df)} rows", flush=True)
            continue
        path = f"{out}/{fname}"
        total = 0
        buf = []
        for i in range(k):
            r = df.copy()
            if i > 0:
                for c in id_cols:
                    r[c] = r[c] + f"_r{i}"
            buf.append(r)
            if len(buf) == BATCH or i == k - 1:
                chunk = pd.concat(buf, ignore_index=True)
                chunk.to_csv(path, index=False, mode="w" if total == 0 else "a",
                             header=(total == 0))
                total += len(chunk)
                buf = []
        print(f"{fname}: {total} rows", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
