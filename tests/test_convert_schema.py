"""The torch->flax weight converter must cover 100% of the reference's
state_dict keys and produce exactly the deva_tpu model's variable schema.

The reference's state_dict() keyset is the schema of the released
`DEVA-propagation.pth` (reference:deva/model/network.py:165-174 load_weights
consumes a state_dict of the same module tree), so an empty diff on a
random-init reference proves the released checkpoint converts first-try.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deva_tpu.models.convert import convert_torch_statedict, schema_diff

from helpers_ref import build_reference_deva


def test_converter_covers_all_reference_keys():
    net = build_reference_deva(seed=1)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    # convert_torch_statedict raises KeyError on any torch key it cannot map
    variables = convert_torch_statedict(sd)
    missing, extra, mismatched = schema_diff(variables)
    assert not missing, f"{len(missing)} model params unmapped: {missing[:8]}"
    assert not extra, f"{len(extra)} converted keys unknown: {extra[:8]}"
    assert not mismatched, mismatched[:8]


def test_converter_rejects_unknown_keys():
    with pytest.raises(KeyError):
        convert_torch_statedict(
            {"pixel_encoder.does_not_exist.weight": np.zeros((4, 4))})
