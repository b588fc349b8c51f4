"""Golden parity: bucket generation + ratio→bucket lookup vs the reference."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

# reference-parity tests need the read-only reference checkout
import pathlib as _pl

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)

from neurosis_tpu.data.aspect import AspectBucketList, SDXLBucketList, WDXLBucketList2

REF = Path("/root/reference/src/neurosis/dataset/aspect/bucket.py")


@pytest.fixture(scope="module")
def ref_bucket_mod():
    spec = importlib.util.spec_from_file_location("ref_aspect_bucket", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_aspect_bucket"] = mod
    spec.loader.exec_module(mod)
    return mod


# NOTE: the reference's DEFAULT constraints (n_buckets=25, 512-1536/64) cannot
# generate 25 buckets and raise upstream too — parity includes that error.
@pytest.mark.parametrize(
    "kwargs",
    [
        dict(n_buckets=20),
        dict(n_buckets=12, edge_min=256, edge_max=1024, edge_step=32, max_aspect=2.0, tgt_pixels=512 * 512),
        dict(n_buckets=30, edge_min=512, edge_max=2048, edge_step=32, max_aspect=4.0, tgt_pixels=1024 * 1024),
        dict(n_buckets=20, use_atan=True, bias_square=False),
    ],
)
def test_generated_buckets_match_reference(ref_bucket_mod, kwargs):
    ours = AspectBucketList(**kwargs)
    ref = ref_bucket_mod.AspectBucketList(**kwargs)
    assert [(b.width, b.height) for b in ours] == [(b.width, b.height) for b in ref]


def test_infeasible_constraints_raise_like_reference(ref_bucket_mod):
    with pytest.raises(ValueError):
        ref_bucket_mod.AspectBucketList()  # upstream defaults are unbuildable
    with pytest.raises(ValueError):
        AspectBucketList()


def test_bucket_lookup_matches_reference(ref_bucket_mod):
    ours = AspectBucketList(n_buckets=20)
    ref = ref_bucket_mod.AspectBucketList(n_buckets=20)
    for ratio in np.linspace(0.3, 3.0, 61):
        assert ours.bucket_idx(float(ratio)) == ref.bucket_idx(float(ratio)), ratio


def test_sdxl_list_shape():
    b = SDXLBucketList()
    assert len(b) == 40
    assert (1024, 1024) in [(x.width, x.height) for x in b]
    # square lookup hits the square bucket
    sq = b.bucket(1.0)
    assert (sq.width, sq.height) == (1024, 1024)


def test_wdxl2_list_shape():
    assert len(WDXLBucketList2()) == 35
