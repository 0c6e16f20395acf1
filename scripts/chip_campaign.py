"""Unattended chip-campaign runner for the blocked hardware measurements.

STATUS: live instrument (r4). The axon TPU tunnel has been down for the
whole round; this script waits for it and, the moment a probe succeeds,
runs the queued campaigns in priority order, logging everything under
results/r4/ and committing results after each stage so nothing is lost
if the tunnel (or the session) dies again:

  1. sub_sweep.py                   — tune (block, ccol, sub) on-chip;
                                      writes best_config.json for bench
  2. bench.py                       — the headline metric (gated engine)
  3. cap_study.py --cached 10       — no-32-cap deviation table (r2 #7)
  4. locomotion.py 63k --assert-... — full undulation cycle (r2 #6)
  5. bench_scale.py 2 0.8           — 2-worm + ~1M dam-break (r3 #3)
  6. resort_ab.py 20k --record      — stale-window physics A/B (r3 #4)
  7. tpu_passes.py                  — per-pass gated-kernel timings

Run:  nohup python scripts/chip_campaign.py > /tmp/campaign.log 2>&1 &
Probes every 5 min; exits when the queue drains or the deadline passes.
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(ROOT, "results", "r4")
PY = sys.executable
DEADLINE = time.time() + float(os.environ.get("CAMPAIGN_HOURS", "10")) * 3600

PROBE = (
    "import json, jax, jax.numpy as jnp\n"
    "d = jax.devices()[0]\n"
    "x = jnp.ones((128,128), jnp.float32)\n"
    "v = float((x@x).sum())\n"
    "print(json.dumps({'platform': d.platform,"
    " 'kind': getattr(d,'device_kind','')}))\n"
)

# (name, argv, timeout_s)
QUEUE = [
    ("pipeline_sweep", [PY, "scripts/pipeline_sweep.py"], 2400),
    ("bench2", [PY, "bench.py"], 2400),
    ("tpu_passes", [PY, "scripts/tpu_passes.py"], 1800),
    ("bench_scale", [PY, "scripts/bench_scale.py", "2", "0.8"], 3600),
    ("resort_ab",
     [PY, "scripts/resort_ab.py", "--steps", "20000", "--record"], 5400),
    ("cap_study2", [PY, "scripts/cap_study.py", "--record", "--cached", "10"],
     3600),
]

# run in the first campaign sweep (2026-08-18 morning), kept out of the
# live queue: sub_sweep, bench (5.59M recorded), cap_study (superseded by
# cap_study2 after the membrane [R,cap,7] OOM fix), locomotion_full_cycle


def log(msg):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(os.path.join(RES, "CAMPAIGN.log"), "a") as fh:
        fh.write(line + "\n")


def probe_ok():
    try:
        r = subprocess.run([PY, "-c", PROBE], capture_output=True, text=True,
                           timeout=240, cwd=ROOT)
        return r.returncode == 0 and "tpu" in (r.stdout or "").lower()
    except subprocess.TimeoutExpired:
        return False


def commit(stage):
    """Commit campaign outputs only (explicit paths; ignores the index)."""
    for attempt in range(5):
        # `git commit -- <paths>` cannot commit untracked files: stage them
        # first so fresh result files are "known to git".
        subprocess.run(["git", "add", "--", "results/r4", "BASELINE.md"],
                       capture_output=True, text=True, cwd=ROOT)
        r = subprocess.run(
            ["git", "commit", "-q",
             "-m", f"Chip campaign: record {stage} results\n\n"
                   "No-Verification-Needed: measurement logs only",
             "--", "results/r4", "BASELINE.md"],
            capture_output=True, text=True, cwd=ROOT)
        if r.returncode == 0 or "nothing to commit" in (r.stdout + r.stderr):
            return
        time.sleep(3)  # index.lock contention with an interactive session
    log(f"WARN: commit for {stage} failed: {(r.stdout + r.stderr)[-200:]}")


def main():
    os.makedirs(RES, exist_ok=True)
    done_path = os.path.join(RES, "campaign_done.json")
    done = set()
    if os.path.exists(done_path):
        done = set(json.load(open(done_path)))
    queue = [q for q in QUEUE if q[0] not in done]
    log(f"campaign start: {len(queue)} stages queued")
    while queue and time.time() < DEADLINE:
        if not probe_ok():
            log("probe: tunnel down")
            time.sleep(300)
            continue
        name, argv, tmo = queue[0]
        log(f"TUNNEL UP — running {name} (timeout {tmo}s)")
        out = os.path.join(RES, f"{name}.log")
        t0 = time.time()
        try:
            with open(out, "a") as fh:
                r = subprocess.run(argv, stdout=fh, stderr=subprocess.STDOUT,
                                   timeout=tmo, cwd=ROOT)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        log(f"{name}: rc={rc} in {time.time()-t0:.0f}s -> {out}")
        if rc == 0:
            queue.pop(0)
            done.add(name)
            json.dump(sorted(done), open(done_path, "w"))
            commit(name)
        else:
            # failed stage: if the tunnel died mid-run, retry it next
            # probe; if the chip is still up the failure is real — move
            # the stage to the back so it can't starve the queue.
            if probe_ok():
                queue.append(queue.pop(0))
                with open(done_path + ".failures", "a") as fh:
                    fh.write(f"{name} rc={rc}\n")
            time.sleep(30)
    log(f"campaign end: {len(queue)} stages left undone "
        f"({[q[0] for q in queue]})")


if __name__ == "__main__":
    main()
