"""Device MSER (mods_tpu/detectors/mser_tpu.py) — label-propagation CCL
correctness and region parity against the native host MSER."""

import numpy as np
import jax.numpy as jnp
import pytest

from mods_tpu.config import CapacityParams
from mods_tpu.detectors.mser import detect_msers_np
from mods_tpu.detectors.mser_tpu import _label_components, detect_mser_tpu


def blob_image(h=96, w=128, seed=0):
    """Light background with dark discs and one bright disc."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 200.0, np.float32)
    img += rng.uniform(-6, 6, (h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    blobs = [(24, 30, 9, 40.0), (60, 40, 7, 60.0), (30, 90, 11, 30.0),
             (70, 100, 8, 235.0)]
    for cy, cx, r, val in blobs:
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        img[m] = val
    return np.clip(img, 0, 255), blobs


@pytest.mark.slow
def test_label_components_vs_scipy():
    from scipy import ndimage
    rng = np.random.default_rng(1)
    m = rng.uniform(size=(2, 48, 64)) < 0.35
    # dilate to get blobby components
    m = np.stack([ndimage.binary_dilation(mi, iterations=2) for mi in m])
    lab = np.asarray(_label_components(jnp.asarray(m), passes=4))
    for b in range(2):
        ref, n = ndimage.label(m[b], structure=[[0, 1, 0], [1, 1, 1],
                                                [0, 1, 0]])
        got = lab[b].reshape(48, 64)
        # same partition: our min-index label must be constant on each
        # scipy component and distinct across touching components
        for c in range(1, n + 1):
            vals = np.unique(got[ref == c])
            assert len(vals) == 1, f"component {c} split"
        roots = [got[ref == c][0] for c in range(1, n + 1)]
        assert len(set(roots)) == n, "components merged"
        assert np.all(got[~m[b]] == 48 * 64)


@pytest.mark.slow
def test_device_mser_finds_native_blobs():
    img, blobs = blob_image()
    caps = CapacityParams(per_view=256)
    ref = detect_msers_np(img, min_size=30, max_area=0.25, min_margin=8)
    views = jnp.asarray(img)[None]
    vhw = jnp.asarray([[img.shape[0], img.shape[1]]], jnp.int32)
    got = detect_mser_tpu(views, vhw, caps, min_size=30, max_area=0.25,
                          min_margin=8)
    mask = np.asarray(got.mask[0])
    xy = np.asarray(got.xy[0])[mask]
    A = np.asarray(got.A[0])[mask]
    assert mask.sum() >= 4, mask.sum()
    # every planted blob must be recovered with a sensible ellipse
    for cy, cx, r, _ in blobs:
        d = np.linalg.norm(xy - [cx, cy], axis=1)
        i = int(np.argmin(d))
        assert d[i] < 2.5, (cx, cy, xy[:8])
        # ellipse radius ~ r/2 (std of a disc = r/2)
        sv = np.linalg.svd(A[i], compute_uv=False)
        assert abs(sv[0] - r / 2) / (r / 2) < 0.35, (r, sv)
    # and the native detector's regions should each have a device twin
    found = 0
    for j in range(len(ref["xy"])):
        d = np.linalg.norm(xy - ref["xy"][j], axis=1)
        if d.min() < 3.0:
            found += 1
    assert found >= max(1, int(0.6 * len(ref["xy"]))), \
        (found, len(ref["xy"]))


def test_device_mser_polarity_and_validity():
    img, _ = blob_image(seed=2)
    caps = CapacityParams(per_view=256)
    views = jnp.asarray(img)[None]
    vhw = jnp.asarray([[img.shape[0], img.shape[1]]], jnp.int32)
    got = detect_mser_tpu(views, vhw, caps, min_size=30, max_area=0.25,
                          min_margin=8)
    mask = np.asarray(got.mask[0])
    sub = np.asarray(got.sub_type[0])[mask]
    assert set(np.unique(sub)) <= {20, 21}
    assert (sub == 21).sum() >= 3      # three dark discs
    assert (sub == 20).sum() >= 1      # one bright disc
    # restricting the valid window must drop regions outside it
    vhw2 = jnp.asarray([[48, 64]], jnp.int32)
    got2 = detect_mser_tpu(views, vhw2, caps, min_size=30, max_area=0.25,
                           min_margin=8)
    m2 = np.asarray(got2.mask[0])
    xy2 = np.asarray(got2.xy[0])[m2]
    assert np.all(xy2[:, 0] < 64) and np.all(xy2[:, 1] < 48)
