"""Build a synthetic full-size cohort for data-layer scale testing.

The labels CSV covers the full 501-subject UCSF-PDGM cohort while the
checkout bundles 6 subjects' volumes.  This script materializes a cohort
directory where EVERY labels row has a volume folder: each synthetic subject
symlinks the files of one of the 6 real subjects (round-robin), renamed to
the synthetic ID — so the loader, cache, and splits see 501 distinct
subjects with real NIfTI bytes behind them (~same decode cost, zero extra
disk for the sources).

Usage: python benchmarks/make_synth_cohort.py --out /tmp/synth_cohort
Then drive the live CLI against it (docs/SCALE_r03.md):
  python -u -m cross_attention_vit_tpu.drivers.experiments --epochs 3 \
      --seeds 2004 --grid-index 0 --model cross \
      --labels /root/reference/labels.csv --data /tmp/synth_cohort \
      --out /tmp/synth_runs
"""

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

REAL = Path("/root/reference/ucsf-data")
LABELS = "/root/reference/labels.csv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_cohort")
    ap.add_argument("--labels", default=LABELS)
    ap.add_argument("--source", default=str(REAL))
    args = ap.parse_args()

    from cross_attention_vit_tpu.data.labels import load_labels

    src = Path(args.source)
    donors = sorted(p for p in src.iterdir() if p.name.endswith("_nifti"))
    assert donors, f"no *_nifti dirs under {src}"
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # full CSV (pre-clean_data): the driver's clean_data does the dropping —
    # the cohort dir must cover every row it might keep
    df = load_labels(args.labels)
    ids = df["ID"].astype(str)
    # clean_data zero-pads the numeric suffix to 4 digits to match folders
    ids = ids.str.replace(r"(\d+)$", lambda m: m.group(1).zfill(4), regex=True)

    n_new = 0
    for i, case in enumerate(ids):
        donor = donors[i % len(donors)]
        donor_id = donor.name[:-len("_nifti")]
        dst = out / f"{case}_nifti"
        if dst.exists():
            continue
        dst.mkdir()
        for f in donor.iterdir():
            newname = f.name.replace(donor_id, case, 1)
            (dst / newname).symlink_to(f)
        n_new += 1
    print(f"cohort at {out}: {len(ids)} subjects ({n_new} new, "
          f"{len(donors)} donors)")


if __name__ == "__main__":
    main()
