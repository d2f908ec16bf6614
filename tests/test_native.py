import numpy as np
import pytest

from invcompcamtrack_tpu.utils import io, native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _write_pgm(path, img):
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(f"P5\n# comment\n{w} {h}\n255\n".encode())
        f.write(img.astype(np.uint8).tobytes())


def _write_ppm(path, img_rgb):
    h, w, _ = img_rgb.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img_rgb.astype(np.uint8).tobytes())


def test_decode_pgm(rng, tmp_path):
    img = rng.integers(0, 255, size=(15, 23)).astype(np.uint8)
    p = tmp_path / "x.pgm"
    _write_pgm(p, img)
    out = native.decode_pnm(p)
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_decode_ppm_luma(rng, tmp_path):
    img = rng.integers(0, 255, size=(8, 9, 3)).astype(np.uint8)
    p = tmp_path / "x.ppm"
    _write_ppm(p, img)
    out = native.decode_pnm(p)
    want = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    np.testing.assert_allclose(out, want, atol=1e-3)


def test_prefetcher_matches_sync_decode(rng, tmp_path):
    paths = []
    imgs = []
    for i in range(6):
        img = rng.integers(0, 255, size=(12, 17)).astype(np.uint8)
        p = tmp_path / f"f{i}.pgm"
        _write_pgm(p, img)
        paths.append(p)
        imgs.append(img)
    pf = native.SequencePrefetcher(paths, num_threads=3)
    # out-of-order access exercises the steal path
    for idx in [3, 0, 5, 1, 4, 2]:
        out = pf.get(idx)
        np.testing.assert_array_equal(out, imgs[idx].astype(np.float32))
    pf.close()


def test_prefetcher_refetch_after_release(rng, tmp_path):
    """A released slot must re-decode on the next get, never hand back
    an uninitialized buffer (round-1 advisor finding)."""
    img = rng.integers(0, 255, size=(10, 13)).astype(np.uint8)
    p = tmp_path / "f.pgm"
    _write_pgm(p, img)
    pf = native.SequencePrefetcher([p], num_threads=1)
    first = pf.get(0, release=True)
    second = pf.get(0, release=True)  # slot was released: must re-decode
    np.testing.assert_array_equal(first, img.astype(np.float32))
    np.testing.assert_array_equal(second, img.astype(np.float32))
    pf.close()


def test_decode_rejects_malformed_header(tmp_path):
    """Hostile/corrupt headers surface as IOError, not bad_alloc."""
    for body in [b"P5\n-3 7\n255\n", b"P5\n70000 70000\n255\n",
                 b"P5\n4 4\n0\n"]:
        p = tmp_path / "bad.pgm"
        p.write_bytes(body + b"\x00" * 16)
        with pytest.raises(IOError):
            native.decode_pnm(p)


def test_native_pointcam_matches_python(rng, tmp_path):
    data = io.PointCamFile(
        pose=rng.normal(size=6),
        fc=np.array([100.0, 101.0], np.float32),
        cc=np.array([50.0, 51.0], np.float32),
        wh=np.array([640, 480], np.uint32),
        pt3d=rng.normal(size=(33, 3)),
        pt2d=rng.normal(size=(33, 2)).astype(np.float32),
    )
    p = tmp_path / "c.bin"
    io.write_pointcam(p, data)
    out = native.read_pointcam_native(p)
    np.testing.assert_allclose(out.pose, data.pose)
    np.testing.assert_allclose(out.pt3d, data.pt3d)
    np.testing.assert_allclose(out.pt2d, data.pt2d)
