#!/usr/bin/env python
"""Post-saturation success-band statistics from a success_curve.csv.

VERDICT r4 item 2's acceptance metric: the band FLOOR (minimum
success rate across checkpoints) after a saturation point, default 4M
env steps — the quantity the PPO LR decay is meant to raise.

    python scripts/band_floor.py <success_curve.csv> [--after 4000000]
"""
import argparse
import csv
import json


def band_stats(path, after=4_000_000):
    rows = []
    with open(path) as f:
        for r in csv.DictReader(f):
            rows.append({
                "update": int(r["update"]),
                "env_steps": int(r["env_steps"]),
                "success_rate": float(r["success_rate"]),
            })
    band = [r for r in rows if r["env_steps"] >= after]
    if not band:
        return {"error": f"no checkpoints after {after} steps"}
    rates = [r["success_rate"] for r in band]
    floor_row = min(band, key=lambda r: r["success_rate"])
    peak_row = max(band, key=lambda r: r["success_rate"])
    return {
        "after_env_steps": after,
        "n_checkpoints": len(band),
        "band_floor": floor_row["success_rate"],
        "band_floor_at": floor_row["env_steps"],
        "band_peak": peak_row["success_rate"],
        "band_peak_at": peak_row["env_steps"],
        "band_mean": round(sum(rates) / len(rates), 4),
        "band_width": round(peak_row["success_rate"]
                            - floor_row["success_rate"], 4),
        "final": rows[-1]["success_rate"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--after", type=int, default=4_000_000)
    args = ap.parse_args()
    print(json.dumps(band_stats(args.csv, args.after), indent=1))


if __name__ == "__main__":
    main()
