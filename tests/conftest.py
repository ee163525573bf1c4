"""Test fixtures: make the read-only reference repo importable as an oracle.

The reference imports `pulp` (ILP solver) and `pycocotools` at module scope;
neither is installed in this image. We inject inert stub modules so the
reference's pure-math modules can be imported for differential testing. Tests
that would actually exercise those libraries use deva_tpu's own implementations
(deva_tpu/inference/ilp.py, deva_tpu/utils/rle.py) instead.
"""
import sys
import types

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


_stub("pulp",
      LpProblem=None, LpMaximize=None, LpVariable=None, lpSum=None,
      PULP_CBC_CMD=None, LpStatus={})
_stub("pycocotools")
_stub("pycocotools.mask", encode=None, decode=None)
