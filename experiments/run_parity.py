#!/usr/bin/env python
"""Zero-friction artifact-landing parity harness (VERDICT r3 item 2).

One command that (a) detects which real artifacts are present — real Div2K
(vs the dead-leaves stand-in, marked by DIV2K/.dead_leaves_standin), the
published HF weights, LPIPS weights — (b) runs the full reference eval
protocol (demo/test.py: val split, deterministic per-image seeds, 8-bit
quantize, Y-channel metrics; BASELINE.md:34-44) for unprocessed / proposed /
supervised, plus the LPIPS golden test when its artifacts exist, and
(c) emits PARITY_RESULT.md with the 0.05 dB verdict per row.

Usage:
    python experiments/run_parity.py                 # auto-detect mode
    python experiments/run_parity.py --rehearse \
        --proposed <weights> [--supervised <weights>]  # stand-in rehearsal

The north-star rows (BASELINE.md, read from the paper's results table):
deblurring FWHM 4.7 = Gaussian_R2, noise 5: supervised 25.9 dB, proposed
25.8 dB, unprocessed 22.8 dB.  In REHEARSAL mode (stand-in data) the report
records the measured numbers without applying the 0.05 dB bar.
"""

import argparse
import datetime
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# published HF weight names (reference README.md:77-89; repo
# jscanvic/scale-equivariant-imaging); we accept any of these spellings
# dropped under weights/ or artifacts/
PROPOSED_NAMES = (
    "Div2K-Train_Deblurring_Gaussian_R2_Noise5_SEI",
    "Deblurring_Gaussian_R2_Noise5_Proposed",
)
SUPERVISED_NAMES = (
    "Div2K-Train_Deblurring_Gaussian_R2_Noise5_Supervised",
    "Deblurring_Gaussian_R2_Noise5_Supervised",
)

BASELINE_ROWS = {  # BASELINE.md FWHM 4.7 (Gaussian_R2) PSNR, dB
    "unprocessed": 22.8,
    "proposed": 25.8,
    "supervised": 25.9,
}
TOLERANCE_DB = 0.05


def find_weights(names):
    for d in ("weights", "artifacts"):
        for n in names:
            p = os.path.join(REPO, d, f"{n}.pt")
            if os.path.exists(p):
                return p
    return None


def div2k_is_real(datasets_dir):
    d = os.path.join(datasets_dir, "DIV2K")
    if not os.path.isdir(os.path.join(d, "DIV2K_valid_HR")):
        return None  # absent
    return not os.path.exists(os.path.join(d, ".dead_leaves_standin"))


def run_eval(tag, extra_args, datasets_dir, log_dir):
    args = [
        sys.executable,
        os.path.join(REPO, "demo", "test.py"),
        "--task", "deblurring", "--kernel", "Gaussian_R2", "--noise_level", "5",
        "--dataset", "div2k",
        "--GroundTruthDataset__datasets_dir", datasets_dir,
    ] + extra_args
    log_path = os.path.join(log_dir, f"parity_eval_{tag}.log")
    print(f"=== eval {tag} -> {log_path}", flush=True)
    with open(log_path, "w") as f:
        f.write("+ " + " ".join(args) + "\n")
        f.flush()
        subprocess.run(args, stdout=f, stderr=subprocess.STDOUT, check=True,
                       timeout=7200)
    out = open(log_path).read()
    metrics = {}
    for key, pat in (
        ("psnr", r"^PSNR: ([0-9.]+)"),
        ("ssim", r"^SSIM: ([0-9.]+)"),
        ("lpips", r"^LPIPS: ([0-9.]+)"),
    ):
        m = re.search(pat, out, re.M)
        if m:
            metrics[key] = float(m.group(1))
    if "psnr" not in metrics:
        raise RuntimeError(f"eval {tag} produced no PSNR (see {log_path})")
    return metrics


def run_lpips_golden():
    """The LPIPS golden test activates itself when artifacts exist."""
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_lpips.py", "-q"],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    tail = (r.stdout or "").strip().splitlines()[-1:]
    return r.returncode == 0, " ".join(tail)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rehearse", action="store_true",
                    help="run the full pipeline on the stand-in data "
                         "(no 0.05 dB bar applied)")
    ap.add_argument("--when-artifacts", action="store_true", dest="when_artifacts",
                    help="exit 0 quietly if the real artifacts are absent")
    ap.add_argument("--datasets_dir", default=os.path.join(REPO, "datasets"))
    ap.add_argument("--proposed", default=None,
                    help="override path to proposed-method weights")
    ap.add_argument("--supervised", default=None,
                    help="override path to supervised weights")
    ap.add_argument("--lpips_weights", default=os.path.join(
        REPO, "artifacts", "lpips_alex.pt"))
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_RESULT.md"))
    args = ap.parse_args()

    real_div2k = div2k_is_real(args.datasets_dir)
    proposed = args.proposed or find_weights(PROPOSED_NAMES)
    supervised = args.supervised or find_weights(SUPERVISED_NAMES)
    have_lpips = os.path.exists(args.lpips_weights)
    rehearsal = args.rehearse or not (real_div2k and proposed)

    if args.when_artifacts and rehearsal and not args.rehearse:
        print("real artifacts absent (need real DIV2K + published weights); "
              "nothing to do.  Run with --rehearse to exercise the pipeline "
              "on the stand-in.")
        return 0
    if real_div2k is None:
        print(f"no DIV2K under {args.datasets_dir}; generate the stand-in "
              "first: python experiments/make_dead_leaves_div2k.py --out "
              f"{args.datasets_dir}")
        return 1
    if rehearsal and proposed is None:
        print("rehearsal needs --proposed <weights> (a locally trained "
              "weights.pt or orbax dir)")
        return 1

    log_dir = os.path.join(REPO, "experiments", "evidence")
    os.makedirs(log_dir, exist_ok=True)
    lpips_flag = ["--lpips_weights", args.lpips_weights] if have_lpips else []

    rows = {}
    rows["unprocessed"] = run_eval(
        "unprocessed", ["--model_kind", "Identity"] + lpips_flag,
        args.datasets_dir, log_dir)
    rows["proposed"] = run_eval(
        "proposed", ["--weights", proposed] + lpips_flag,
        args.datasets_dir, log_dir)
    if supervised:
        rows["supervised"] = run_eval(
            "supervised", ["--weights", supervised] + lpips_flag,
            args.datasets_dir, log_dir)

    lpips_ok = lpips_note = None
    if have_lpips:
        lpips_ok, lpips_note = run_lpips_golden()

    mode = "REHEARSAL (stand-in data)" if rehearsal else "REAL ARTIFACTS"
    lines = [
        "# PARITY_RESULT",
        "",
        f"- mode: **{mode}**",
        f"- date: {datetime.datetime.now().isoformat(timespec='seconds')}",
        f"- datasets_dir: `{args.datasets_dir}` "
        f"(real Div2K: {bool(real_div2k)})",
        f"- proposed weights: `{proposed}`",
        f"- supervised weights: `{supervised}`",
        f"- LPIPS artifacts: {have_lpips}"
        + (f" (golden test: {'PASS' if lpips_ok else 'FAIL'} — {lpips_note})"
           if have_lpips else ""),
        "",
        "| Row | PSNR (dB) | SSIM | LPIPS | paper PSNR | Δ | verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    all_pass = True
    for name, m in rows.items():
        target = BASELINE_ROWS[name]
        delta = m["psnr"] - target
        if rehearsal:
            verdict = "n/a (stand-in)"
        elif abs(delta) <= TOLERANCE_DB:
            verdict = "**PASS** (≤0.05 dB)"
        else:
            verdict = "**FAIL**"
            all_pass = False
        lines.append(
            f"| {name} | {m['psnr']:.2f} | {m.get('ssim', float('nan')):.4f} "
            f"| {m.get('lpips', float('nan')):.4f} | {target} "
            f"| {delta:+.2f} | {verdict} |"
        )
    lines += [
        "",
        "Protocol: demo/test.py — Div2K val split, shorter-side-256 resize, "
        "deterministic per-image measurement seeds, Gaussian noise 5/255, "
        "8-bit quantize+clamp, Y-channel PSNR/SSIM (BASELINE.md:34-44).",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    print(f"wrote {args.out}")
    return 0 if (rehearsal or all_pass) else 2


if __name__ == "__main__":
    sys.exit(main())
