"""gvtImageDiff equivalent: tolerance compare of two PPMs.

Reference: src/apps/render/ImageDiff.cpp; usage mirrors
  gvtImageDiff -tolerance 0.05 -diff "golden.ppm,ours.ppm"
exit 0 iff the fraction of differing pixel bytes <= tolerance.
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from gravit_tpu.scene.image import image_diff, max_byte_error, read_ppm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-tolerance", type=float, default=0.0)
    p.add_argument("-diff", required=True,
                   help="comma-separated pair: a.ppm,b.ppm")
    args = p.parse_args()
    a_path, b_path = args.diff.split(",")
    a, b = read_ppm(a_path.strip()), read_ppm(b_path.strip())
    frac = image_diff(a, b)
    print(f"differing byte fraction: {frac:.6f}  "
          f"max byte error: {max_byte_error(a, b)}")
    sys.exit(0 if frac <= args.tolerance else 1)


if __name__ == "__main__":
    main()
