"""Background TPU-tunnel watcher: probes the axon backend in a subprocess
(the tunnel hangs rather than errors, so each probe gets a hard timeout)
and appends a status line to the log each cycle.  Run detached:

    nohup python tools/tpu_watch.py /tmp/tpu_watch4.log &

The round-3 pattern (ROUND3.md item 1): the backend may register but hang
during init, so the probe must actually execute a tiny computation.
"""
import subprocess
import sys
import time

PROBE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((8,));"
    "print('OK', jax.devices()[0].platform, float(x.sum()))"
)


def probe(timeout=120):
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE],
            capture_output=True, text=True, timeout=timeout,
        )
        if out.returncode == 0 and "OK" in out.stdout:
            return True, out.stdout.strip().splitlines()[-1]
        return False, (out.stderr or out.stdout).strip().splitlines()[-1:] or ["?"]
    except subprocess.TimeoutExpired:
        return False, "timeout"


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_watch4.log"
    while True:
        ok, msg = probe()
        with open(log, "a") as f:
            f.write(f"{time.strftime('%Y-%m-%d %H:%M:%S')} {'UP' if ok else 'down'} {msg}\n")
        if ok:
            # Stay resident and keep confirming every 10 min so a later
            # reader can see whether the tunnel stayed up.
            time.sleep(600)
        else:
            time.sleep(180)


if __name__ == "__main__":
    main()
