"""Convert reference DEVA torch weights (.pth) to deva_tpu .npz.

  python scripts/convert_reference_weights.py saves/DEVA-propagation.pth \
      saves/DEVA-propagation.npz
"""
import sys
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

from flax.traverse_util import flatten_dict

from deva_tpu.models.convert import load_torch_checkpoint


def main():
    src, dst = sys.argv[1], sys.argv[2]
    variables = load_torch_checkpoint(src)
    flat = flatten_dict(variables)
    np.savez(dst, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
    print(f"Converted {src} -> {dst} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
