"""Native C data-loader kernels vs their numpy/cv2 references."""
import numpy as np
import pytest

from lbc_tpu.native import (get_lib, pack_birdview_native,
                            rotate_nearest_native, unpack_birdview_native)


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason='no C toolchain available')


def test_unpack_matches_numpy():
    rng = np.random.RandomState(0)
    packed = rng.randint(0, 128, (3, 64, 64), np.uint8)
    native = unpack_birdview_native(packed)
    ref = np.stack([(packed >> c) & 1 for c in range(7)],
                   axis=-1).astype(np.float32)
    np.testing.assert_array_equal(native, ref)


def test_pack_roundtrip():
    rng = np.random.RandomState(1)
    bv = (rng.rand(2, 32, 32, 7) > 0.5).astype(np.float32)
    packed = pack_birdview_native(bv)
    back = unpack_birdview_native(packed)
    np.testing.assert_array_equal(back, bv)


def test_rotate_matches_cv2():
    import cv2
    rng = np.random.RandomState(2)
    img = rng.randint(0, 128, (320, 320), np.uint8)
    for deg in (-15.0, -5.0, 5.0, 12.0):
        native = rotate_nearest_native(img, 160.0, 260.0, deg)
        m = cv2.getRotationMatrix2D((160, 260), deg, 1.0)
        ref = cv2.warpAffine(img, m, (320, 320),
                             flags=cv2.INTER_NEAREST)
        agree = (native == ref).mean()
        # rounding at pixel boundaries may differ by a hair
        assert agree > 0.95, f'{deg}: {agree}'


def test_speedup_sanity():
    """The native unpack should not be slower than numpy. Best-of-3 on
    both sides: single-shot wall times flake when the box is loaded
    (TPU training on the 1-core host runs alongside CI)."""
    import time
    rng = np.random.RandomState(3)
    packed = rng.randint(0, 128, (64, 320, 320), np.uint8)

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return min(times)

    t_native = best_of(lambda: unpack_birdview_native(packed))
    t_numpy = best_of(lambda: np.stack(
        [(packed >> c) & 1 for c in range(7)],
        axis=-1).astype(np.float32))
    assert t_native < t_numpy * 2.0
