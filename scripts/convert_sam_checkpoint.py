"""Convert a released MobileSAM / Light-HQ-SAM torch checkpoint to the
TPU-native JaxMobileSAM variable tree (npz).

  python scripts/convert_sam_checkpoint.py mobile_sam.pt mobile_sam.npz
  python scripts/convert_sam_checkpoint.py sam_hq_vit_tiny.pt light_hq.npz --hq

The original segment_anything / sam-hq state_dict layout is mapped by
deva_tpu.ext.sam_decoder.convert_original_sam_statedict (round-trip-tested
in tests/test_sam_decoder.py) and tiny_vit.convert_tiny_vit_statedict
(differential-tested against the vendored torch TinyViT). Load with

  from deva_tpu.ext.jax_sam import JaxMobileSAM, load_variables_npz
  sam = JaxMobileSAM(load_variables_npz("mobile_sam.npz"))
"""
import sys
from os import path

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))


def main():
    import numpy as np
    import jax

    from deva_tpu.ext.jax_sam import JaxMobileSAM

    src, dst = sys.argv[1], sys.argv[2]
    hq = "--hq" in sys.argv
    sam = JaxMobileSAM.from_torch_checkpoint(src, hq=hq)
    flat = {}
    for pth, leaf in jax.tree_util.tree_leaves_with_path(sam.variables):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in pth)
        flat[key] = np.asarray(leaf)
    np.savez_compressed(dst, **flat)
    print(f"wrote {dst} ({len(flat)} arrays, hq={hq})")


if __name__ == "__main__":
    main()
