"""Headline benchmark (driver entry): TPU e2e speedups vs the reference.

Runs two sub-benchmarks in separate subprocesses (each gets a clean HBM
footprint on the single chip):

1. scripts/bench_hyvideo.py — HunyuanVideo 720p x 129f T2V, dense vs SVG1,
   blended over the reference 50-step schedule. This is BASELINE.md's
   north-star config (reference: 1.91x on H100,
   /root/reference/README.md:126) and the headline metric reported here.
2. scripts/bench_wan_e2e.py — Wan 2.1 720p T2V, dense vs SVG1 vs SAP
   (reference SVG1: 1.51x H100; SVG2 claim ~2x).

Prints ONE JSON line:
  {"metric": "hyvideo_720p_svg1_e2e_speedup", "value": N, "unit": "x",
   "vs_baseline": N / 1.91, ...wan fields...}

Each sub-benchmark prints its own JSON line; see the module docstrings for
methodology (full-DiT steps, warm-up fraction blends, fp8 weight storage
for the 13B hyvideo on a 16 GB chip).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF_HYVIDEO = 1.91


def run_sub(script, args=()):
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", script), *args],
        capture_output=True, text=True, timeout=5400,
    )
    sys.stderr.write(p.stderr)
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{script} produced no JSON (exit {p.returncode}):\n{p.stdout[-2000:]}")


def main():
    try:
        import jax
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        # value stays 0 — this run measured nothing. last_measured_on_tpu is
        # provenance only (the 2026-08-17 full-bench set, NOTES_ROUND3.md),
        # for when the axon tunnel is down at bench time.
        print(json.dumps({
            "metric": "hyvideo_720p_svg1_e2e_speedup", "value": 0.0,
            "unit": "x", "vs_baseline": 0.0, "note": "no TPU available",
            "last_measured_on_tpu": {
                "date": "2026-08-17",
                "hyvideo_720p_svg1_e2e_speedup": 1.973,
                "hyvideo_vs_baseline": 1.033,
                "wan_720p_svg1_e2e_speedup": 1.753,
                "wan14b_720p_svg1_e2e_speedup": 1.725,
                "wan_720p_sap_e2e_speedup": 1.032,
                "wan14b_720p_sap_e2e_speedup": 1.056,
                "source": "NOTES_ROUND3.md final round-3 bench set",
            },
        }))
        return

    def safe(script, args=()):
        try:
            return run_sub(script, args)
        except Exception as e:
            sys.stderr.write(f"[bench] {script} failed: {e}\n")
            return {}

    wan = safe("bench_wan_e2e.py")
    wan14 = safe("bench_wan14b.py")
    hyv = safe("bench_hyvideo.py")
    if not hyv.get("value"):
        # headline sub-bench failed: still emit a parseable line with the
        # wan measurement so the round records SOMETHING (vs_baseline
        # against wan's own 1.51x reference)
        print(json.dumps({
            "metric": "wan_720p_svg1_e2e_speedup_fallback",
            "value": wan.get("value", 0.0), "unit": "x",
            "vs_baseline": wan.get("vs_baseline", 0.0),
            "note": "bench_hyvideo failed; wan numbers reported",
            "wan14b_720p_svg1_e2e_speedup": wan14.get("value"),
        }))
        return

    out = {
        "metric": "hyvideo_720p_svg1_e2e_speedup",
        "value": hyv["value"],
        "unit": "x",
        "vs_baseline": round(hyv["value"] / REF_HYVIDEO, 3) if hyv["value"] else 0.0,
        "hyvideo_dense_step_s": hyv.get("dense_step_s"),
        "hyvideo_svg1_step_s": hyv.get("svg1_step_s"),
        "hyvideo_sap_e2e_speedup": hyv.get("sap_e2e_speedup"),
        "wan_720p_svg1_e2e_speedup": wan.get("value"),
        "wan_720p_svg1_vs_ref": wan.get("vs_baseline"),
        "wan_720p_sap_e2e_speedup": wan.get("sap_e2e_speedup"),
        "wan_dense_step_s": wan.get("dense_step_s"),
        "wan14b_720p_svg1_e2e_speedup": wan14.get("value"),
        "wan14b_720p_svg1_vs_ref": wan14.get("vs_baseline"),
        "wan14b_720p_sap_e2e_speedup": wan14.get("sap_e2e_speedup"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
