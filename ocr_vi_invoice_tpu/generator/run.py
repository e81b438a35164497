"""Synthetic dataset CLI (parity with `generator/det/run.py:41-163`).

  python -m ocr_vi_invoice_tpu.generator.run --output data/train_det \
      --num_samples 20000 --scenario mixed --seed 42 --workers 4
"""

from __future__ import annotations

import argparse
import time
from collections import Counter
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from ocr_vi_invoice_tpu.generator.generator import (
    GenerationScenario,
    SyntheticInvoiceGenerator,
    apply_holdout_profile,
    get_scenario_config,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Generate synthetic invoice data")
    ap.add_argument("--output", "-o", type=str, required=True)
    ap.add_argument("--num_samples", "-n", type=int, default=1000)
    ap.add_argument("--scenario", type=str, default="mixed",
                    choices=[s.value for s in GenerationScenario])
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--start_index", type=int, default=0)
    ap.add_argument("--holdout_profile", default="none",
                    choices=["none", "train", "shifted"],
                    help="domain-shift holdout: 'train' excludes the "
                         "held-out layouts/font family/defect regime; "
                         "'shifted' generates ONLY from the held-out "
                         "slice (see generator.apply_holdout_profile)")
    args = ap.parse_args(argv)

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    scenario = GenerationScenario(args.scenario)

    counts: Counter = Counter()
    t0 = time.time()

    def make(i: int):
        # Per-sample generator => deterministic irrespective of scheduling.
        gen = SyntheticInvoiceGenerator(
            apply_holdout_profile(get_scenario_config(scenario),
                                  args.holdout_profile),
            seed=args.seed + i,
        )
        try:
            img, anns, kind = gen.generate_sample()
            gen.save_sample(out_dir, f"{i:06d}", img, anns, kind)
            return kind, len(anns)
        except Exception as e:  # keep the factory running on rare failures
            print(f"Warning: sample {i} failed: {e}")
            return "failed", 0

    indices = range(args.start_index, args.start_index + args.num_samples)
    if args.workers > 1:
        with ThreadPoolExecutor(max_workers=args.workers) as ex:
            results = list(ex.map(make, indices))
    else:
        results = [make(i) for i in indices]

    n_anns = 0
    for kind, na in results:
        counts[kind] += 1
        n_anns += na

    dt = time.time() - t0
    total = sum(counts.values())
    print(f"\nGenerated {total} samples in {dt:.1f}s "
          f"({total / max(dt, 1e-9):.1f}/s) -> {out_dir}")
    for kind, n in sorted(counts.items()):
        print(f"  {kind:12s} {n:7d}  ({100.0 * n / max(total, 1):.1f}%)")
    print(f"  total text annotations: {n_anns}")


if __name__ == "__main__":
    main()
