"""Round-trip tests for the reference-format feature/match files."""

import numpy as np

from mods_tpu.io.regions_io import (RegionSet, load_regions, read_h,
                                    read_matches, save_regions, write_h,
                                    write_matches)


def _random_rs(rng, n, dim=128):
    return RegionSet(
        det_xy=rng.uniform(0, 500, (n, 2)),
        det_A=rng.normal(size=(n, 2, 2)),
        det_s=rng.uniform(1, 10, n),
        reproj_xy=rng.uniform(0, 500, (n, 2)),
        reproj_A=rng.normal(size=(n, 2, 2)),
        reproj_s=rng.uniform(1, 10, n),
        sub_type=rng.integers(0, 3, n),
        desc=np.round(rng.uniform(0, 255, (n, dim))),
    )


def test_regions_roundtrip(tmp_path, rng):
    store = {
        "HessianAffine": {"RootSIFT": _random_rs(rng, 5),
                          "HalfRootSIFT": _random_rs(rng, 3, dim=64)},
        "DoG": {"RootSIFT": _random_rs(rng, 2)},
    }
    path = str(tmp_path / "regions.txt")
    save_regions(path, store)
    loaded = load_regions(path)
    assert set(loaded) == set(store)
    for det in store:
        for d in store[det]:
            a, b = store[det][d], loaded[det][d]
            np.testing.assert_allclose(b.det_xy, a.det_xy, rtol=1e-6)
            np.testing.assert_allclose(b.reproj_A, a.reproj_A, rtol=1e-6)
            np.testing.assert_allclose(b.desc, a.desc, rtol=1e-6)
            np.testing.assert_array_equal(b.sub_type, a.sub_type)


def test_matches_roundtrip(tmp_path, rng):
    xy1 = rng.uniform(0, 100, (7, 2))
    xy2 = rng.uniform(0, 100, (7, 2))
    p = str(tmp_path / "m.txt")
    write_matches(p, xy1, xy2, extra=np.arange(7.0))
    a, b = read_matches(p)
    np.testing.assert_allclose(a, xy1, rtol=1e-6)
    np.testing.assert_allclose(b, xy2, rtol=1e-6)


def test_h_roundtrip(tmp_path, rng):
    H = rng.normal(size=(3, 3))
    p = str(tmp_path / "h.txt")
    write_h(p, H)
    np.testing.assert_allclose(read_h(p), H, rtol=1e-6)


def test_michal_format_roundtrip(tmp_path):
    """SaveRegionsMichal binary format (imagerepresentation.cpp:
    2049-2146): per-descriptor files, magic/counts header, rectified
    frames, uint8 descriptor bytes."""
    from mods_tpu.io.regions_io import (RegionSet, load_regions_michal,
                                        save_regions_michal)
    rng = np.random.default_rng(0)
    n = 7
    xy = rng.uniform(0, 100, (n, 2))
    th = rng.uniform(0, 2 * np.pi, n)
    A = np.stack([np.stack([np.cos(th), -np.sin(th)], -1),
                  np.stack([np.sin(th), np.cos(th)], -1)], -2)
    s = rng.uniform(2, 6, n)
    desc = rng.uniform(0, 255, (n, 128)).round()
    rs = RegionSet(xy, A, s, xy, A, s, np.zeros(n), desc)
    files = save_regions_michal(
        str(tmp_path / "feat."), {("HessianAffine", "RootSIFT"): rs},
        img_w=200, img_h=100)
    assert files == [str(tmp_path / "feat.RootSIFT")]
    lxy, ls, lA, lst, lresp, ldesc = load_regions_michal(files[0])
    np.testing.assert_allclose(lxy, xy, rtol=1e-6)
    np.testing.assert_allclose(ls, s * 3.0 * np.sqrt(3.0), rtol=1e-5)
    # frames rectified: a12 == 0, unit determinant preserved
    assert np.allclose(lA[:, 0, 1], 0.0)
    assert np.allclose(np.linalg.det(lA), 1.0, atol=1e-5)
    np.testing.assert_array_equal(ldesc, desc)
