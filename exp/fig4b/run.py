"""Figure 4b analog: impact of feature dimension under a fixed cache budget.

Reference exp/fig4b (readme.md:1-20) is a SIMULATION over fig4a's
measured hit-rate-vs-cache-ratio curve: given a fixed cache byte budget,
a larger feature dimension means fewer cacheable rows, hence a lower hit
rate, hence a super-linear growth of per-batch transfer volume:

    cacheable_pct(dim) = budget / (num_node * dim * itemsize)
    miss_bytes(dim) ∝ (1 - hit(cacheable_pct(dim))) * dim

Reads ``exp/fig4a/fig4a.json`` (run fig4a first), interpolates the hit
curve, and emits miss-transfer size relative to dim=128.

Usage: python exp/fig4b/run.py [--budget-mb 64] [--dims 32 64 128 256 512]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIG4A = os.path.join(os.path.dirname(HERE), "fig4a", "fig4a.json")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--budget-mb", type=float, default=64.0,
                   help="fixed cache byte budget (reference uses 5GB "
                        "against papers100M's 54GB feature file; scale "
                        "to the synthetic dataset fig4a ran on)")
    p.add_argument("--dims", nargs="+", type=int,
                   default=[32, 64, 128, 256, 512])
    p.add_argument("--base-dim", type=int, default=128)
    p.add_argument("--itemsize", type=int, default=4)
    p.add_argument("--num-node", type=int, default=None,
                   help="fallback when fig4a.json predates the "
                        "num_node config echo")
    args = p.parse_args()

    with open(FIG4A) as f:
        runs = json.load(f)
    pts = []
    for r in runs:
        if r["rc"] != 0 or "cache_hit_rate" not in r["values"]:
            continue
        pts.append((float(r["config"]["cache_percentage"]),
                    float(r["values"]["cache_hit_rate"])))
    if not pts:
        sys.exit("fig4a.json has no usable hit-rate points — run fig4a")
    pts.sort()
    num_node = int(runs[0]["config"].get("num_node",
                                         args.num_node or 1_000_000))
    pcts = np.array([p_ for p_, _ in pts])
    hits = np.array([h for _, h in pts])

    budget = args.budget_mb * 2**20
    rows = []
    for dim in args.dims:
        cacheable = min(1.0, budget / (num_node * dim * args.itemsize))
        hit = float(np.interp(cacheable, pcts, hits))
        # per-row transfer scales with dim; miss fraction with (1-hit)
        rel_miss = (1.0 - hit) * dim / args.base_dim
        rows.append((dim, cacheable, hit, rel_miss))
    base_miss = next(r[3] for r in rows if r[0] == args.base_dim)

    dat = os.path.join(HERE, "fig4b.dat")
    with open(dat, "w") as f:
        f.write("dim\tcacheable_pct\tcache_hit_rate\trel_transfer_size\n")
        for dim, cacheable, hit, rel in rows:
            f.write(f"{dim}\t{cacheable:.4f}\t{hit:.4f}"
                    f"\t{rel / base_miss:.4f}\n")
    print(f"[exp] wrote {dat}")
    with open(os.path.join(HERE, "fig4b.json"), "w") as f:
        json.dump(
            [{"dim": d, "cacheable_pct": c, "cache_hit_rate": h,
              "rel_transfer_size": r / base_miss}
             for d, c, h, r in rows], f, indent=2)


if __name__ == "__main__":
    main()
