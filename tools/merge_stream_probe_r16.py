#!/usr/bin/env python3
"""Merge the two one-provider StreamBench runs into STREAM_PROBE_r16.json
with per-leg provider deltas (rows/s ratio, state bytes ratio)."""
import json
import sys


def main(hdfs_path, rocks_path, out_path):
    h = json.load(open(hdfs_path))
    r = json.load(open(rocks_path))
    legs = {}
    for name in h["probes"]:
        hp, rp = h["probes"][name], r["probes"].get(name)
        legs[name] = {"hdfs": hp, "rocksdb": rp}
        if rp and hp.get("rows_per_s") and rp.get("rows_per_s"):
            legs[name]["rocksdb_vs_hdfs_rows_per_s"] = round(
                rp["rows_per_s"] / hp["rows_per_s"], 3)
        if rp and hp.get("state_bytes") and rp.get("state_bytes"):
            legs[name]["rocksdb_vs_hdfs_state_bytes"] = round(
                rp["state_bytes"] / hp["state_bytes"], 3)
    doc = {
        "note": (
            "r16 two-provider stream probe (r15 verdict #6): every leg run "
            "under the HDFS-backed default AND RocksDBStateStoreProvider on "
            "the same load, sequentially on an otherwise idle box. The three "
            "r16 heavy-state legs are the ones the provider choice exists "
            "for: dedup_gate (dropDuplicatesWithinWatermark, one state row "
            "per distinct fingerprint in the watermark), vocab_first_seen "
            "(one row per distinct term - the n-gram coverage gate's "
            "state-store form), retention_state (per-user growing period "
            "sets - the RFM-class per-user state; rfmMaintained itself "
            "keeps state in parquet snapshots via foreachBatch BY DESIGN, "
            "so the provider is a no-op for it, same for "
            "dupCoverageMaintained's df-count snapshots). state_bytes is "
            "each provider's own memory accounting (HDFS: in-heap map "
            "size; RocksDB: block-cache/memtable usage) - comparable "
            "within a provider across legs, indicative across providers."
        ),
        "n_keys": h["n_keys"],
        "n_buckets": h["n_buckets"],
        "legs": legs,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    for n, v in legs.items():
        print(n, "rps_ratio", v.get("rocksdb_vs_hdfs_rows_per_s"),
              "bytes_ratio", v.get("rocksdb_vs_hdfs_state_bytes"))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
