import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbc_tpu.data import (SCHEDULE_NAMES, BatchSampler, Episode,
                          FrameDataset, ReplayBuffer, SampleConfig,
                          augment_batch, collect_episodes, pack_birdview,
                          schedule_params, unpack_birdview,
                          world_to_crop_pixel, write_episode)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    bv = (rng.rand(4, 320, 320, 7) > 0.7).astype(np.float32)
    packed = pack_birdview(bv)
    assert packed.dtype == np.uint8 and packed.shape == (4, 320, 320)
    out = unpack_birdview(packed)
    np.testing.assert_array_equal(out, bv)


def test_world_to_crop_pixel_anchor():
    # a point `f` meters straight ahead lands at (col 96, row 192 - 5f)
    # with the default dy = -10 (birdview_lmdb.py label convention)
    px, py = world_to_crop_pixel(10.0, 0.0, 0.0, 0.0, 1.0, 0.0, dx=0,
                                 dy=-10)
    assert abs(px - 96.0) < 1e-6
    assert abs(py - (192.0 - 50.0)) < 1e-6
    # lateral point
    px, py = world_to_crop_pixel(0.0, 2.0, 0.0, 0.0, 1.0, 0.0, dx=0,
                                 dy=-10)
    assert abs(px - (96.0 + 10.0)) < 1e-6


def _fake_episode(tmp_path, n=80, speed=5.0):
    """Straight-line drive east at `speed`; BEV = random static pattern."""
    rng = np.random.RandomState(1)
    meas = np.zeros((n, 17), np.float32)
    for i in range(n):
        meas[i, 0] = speed * 0.1 * i          # x
        meas[i, 1] = 50.0                     # y
        meas[i, 3] = 1.0                      # ori x
        meas[i, 5] = speed                    # vel x
        meas[i, 11] = 4                       # cmd FOLLOW
    bv = (rng.rand(n, 320, 320, 7) > 0.95).astype(np.float32)
    ctrl = np.zeros((n, 3), np.float32)
    return write_episode(tmp_path / 'ep0', birdview=bv,
                         measurements=meas, control=ctrl)


def test_dataset_labels_straight(tmp_path):
    _fake_episode(tmp_path)
    ds = FrameDataset(tmp_path, SampleConfig(crop_x_jitter=0,
                                             crop_y_jitter=0,
                                             angle_jitter=0))
    assert len(ds) == 80 - 25
    s = ds.get_birdview_sample(0, np.random.RandomState(0))
    assert s['birdview'].shape == (192, 192, 7)
    assert s['command'] == 4
    assert abs(s['speed'] - 5.0) < 1e-5
    # straight drive at 5 m/s: waypoint k at 2.5*k m ahead
    # -> row 192 - 12.5k, col 96
    for k in range(5):
        col, row = s['location_px'][k]
        assert abs(col - 96.0) < 1e-3
        assert abs(row - (192.0 - 12.5 * (k + 1))) < 1e-3


def test_batch_sampler(tmp_path):
    _fake_episode(tmp_path)
    ds = FrameDataset(tmp_path)
    batches = list(BatchSampler(ds, batch_size=8, samples=3))
    assert len(batches) == 3
    b = batches[0]
    assert b['birdview'].shape == (8, 192, 192, 7)
    assert b['location_px'].shape == (8, 5, 2)
    assert b['command'].dtype == np.int32


def test_replay_buffer():
    buf = ReplayBuffer(capacity=10, seed=0)
    for i in range(14):
        buf.add(weight=float(i), x=np.array([i], np.float32))
    assert len(buf) == 10
    # the smallest weights were evicted
    assert min(buf._weights) >= 4.0 - 1e-6
    idx, batch = buf.sample(32)
    assert batch['x'].shape == (32, 1)
    # high-weight items sampled more often
    vals = batch['x'][:, 0]
    assert vals.mean() > 7.5
    buf.update_weights(idx[:5], np.zeros(5))
    _, topb = buf.top_k(3)
    assert topb['x'].shape == (3, 1)


def test_augment_batch_shapes():
    key = jax.random.PRNGKey(0)
    imgs = jnp.ones((4, 32, 48, 3)) * 0.5
    # 2M images seen -> super_hard frequency is capped at 1.0: every op
    # fires and the image must change
    params = schedule_params('super_hard', 2_000_000)
    assert float(params.freq) == 1.0
    out = augment_batch(key, imgs, params)
    assert out.shape == imgs.shape
    assert bool(jnp.all((out >= 0) & (out <= 1)))
    assert float(jnp.abs(out - imgs).max()) > 0.01


def test_convert_lmdb_dataset(tmp_path, monkeypatch):
    """Reference-LMDB ingestion path exercised against a stub lmdb module
    (the real lib is not in this image; data layout per
    data_collector.py:234-252)."""
    import contextlib
    import sys
    import types

    rng = np.random.RandomState(0)
    n = 3
    d = {b'len': str(n).encode()}
    bvs = []
    for i in range(n):
        bv = (rng.rand(320, 320, 7) > 0.5).astype(np.uint8)
        bvs.append(bv)
        d[b'rgb_%04d' % i] = rng.randint(
            0, 255, (160, 384, 3)).astype(np.uint8).tobytes()
        d[b'birdview_%04d' % i] = bv.tobytes()
        d[b'measurements_%04d' % i] = rng.rand(17).astype(
            np.float32).tobytes()
        d[b'control_%04d' % i] = rng.rand(3).astype(np.float32).tobytes()

    class FakeTxn:
        def get(self, k):
            return d[k]

    class FakeEnv:
        def begin(self):
            @contextlib.contextmanager
            def cm():
                yield FakeTxn()
            return cm()

    fake = types.ModuleType('lmdb')
    fake.open = lambda path, **kw: FakeEnv()
    monkeypatch.setitem(sys.modules, 'lmdb', fake)

    src = tmp_path / 'src' / 'episode_000'
    src.mkdir(parents=True)
    (src / 'data.mdb').write_bytes(b'stub')

    from lbc_tpu.data import convert_lmdb_dataset, list_episodes
    count = convert_lmdb_dataset(tmp_path / 'src', tmp_path / 'out')
    assert count == 1
    eps = list_episodes(tmp_path / 'out')
    assert len(eps) == 1
    meas = np.load(eps[0] / 'measurements.npy')
    assert meas.shape == (n, 17)
    packed = np.load(eps[0] / 'birdview_packed.npy')
    np.testing.assert_array_equal(unpack_birdview(packed[0]),
                                  bvs[0].astype(np.float32))


def test_augment_schedules_anneal():
    """Every named schedule starts gentle (freq 0.05 at iter 0) and
    ramps with the reference's formulas (augmenter.py:17-388)."""
    for name in SCHEDULE_NAMES:
        p0 = schedule_params(name, 0)
        assert abs(float(p0.freq) - 0.05) < 1e-6
        assert abs(float(p0.blur_max) - 0.5) < 1e-6
        assert abs(float(p0.mult_lo) - 1.0) < 1e-6
        p1 = schedule_params(name, 1_000_000)
        assert float(p1.freq) > float(p0.freq)
        assert float(p1.add_max) > float(p0.add_max)
        assert float(p1.mult_hi) > float(p1.mult_lo)
    # super_hard's frequency is capped at 1.0 (augmenter.py:234)
    assert float(schedule_params('super_hard', 10_000_000).freq) == 1.0
    # the iteration clock: *_harder anneal faster than their base
    assert float(schedule_params('medium_harder', 500_000).freq) > \
        float(schedule_params('medium', 500_000).freq)


def test_collect_episodes_small(tmp_path):
    n = collect_episodes(tmp_path, n_episodes=1, frames_per_episode=400,
                         seed=3, batch_size=2, min_frames=30,
                         pose_pairs=[(35, 39), (191, 195)])
    assert n >= 1
    eps = list((tmp_path).glob('episode_*'))
    assert eps
    ep = Episode(eps[0])
    assert len(ep) >= 30
    assert ep.measurements.shape[1] == 17
    # ego moved
    assert np.hypot(*(ep.measurements[-1][:2]
                      - ep.measurements[0][:2])) > 10


def test_collect_rgb_batched_matches_per_env(tmp_path):
    """RGB collection through the batched Pallas camera path produces the
    same episodes as the per-env XLA path (same seeds -> same world;
    frames agree up to capsule-boundary pixels)."""
    kw = dict(n_episodes=1, frames_per_episode=400, seed=3, batch_size=1,
              min_frames=30, pose_pairs=[(35, 39)], render_rgb=True)
    n1 = collect_episodes(tmp_path / 'a', rgb_batched=False, **kw)
    n2 = collect_episodes(tmp_path / 'b', rgb_batched=True,
                          pallas_interpret=True, **kw)
    assert n1 == n2 == 1
    ep_a = Episode(next((tmp_path / 'a').glob('episode_*')))
    ep_b = Episode(next((tmp_path / 'b').glob('episode_*')))
    assert len(ep_a) == len(ep_b)
    np.testing.assert_array_equal(ep_a.measurements, ep_b.measurements)
    ra, rb = ep_a.rgb[0].astype(int), ep_b.rgb[0].astype(int)
    assert ra.shape == rb.shape == (160, 384, 3)
    assert np.mean(np.abs(ra - rb) > 2) < 1e-3
