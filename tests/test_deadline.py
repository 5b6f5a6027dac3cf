"""Cooperative trainer deadline stops (lbc_tpu/utils/deadline.py).

The round-5 pipeline bounds phase-1 / DAgger wall time with deadline
files instead of killing TPU processes (which wedges the tunneled
worker); these tests pin the file protocol and the trainer-side cut.
"""
import time

from lbc_tpu.utils.deadline import deadline_file, wall_deadline_passed


def test_missing_file_means_no_deadline(tmp_path, monkeypatch):
    monkeypatch.setenv('LBC_DEADLINE_DIR', str(tmp_path))
    assert not wall_deadline_passed('image')


def test_past_and_future_deadlines(tmp_path, monkeypatch):
    monkeypatch.setenv('LBC_DEADLINE_DIR', str(tmp_path))
    path = deadline_file('image')
    with open(path, 'w') as f:
        f.write(str(time.time() - 5))
    assert wall_deadline_passed('image')
    with open(path, 'w') as f:
        f.write(str(time.time() + 3600))
    assert not wall_deadline_passed('image')


def test_garbage_file_is_ignored(tmp_path, monkeypatch):
    monkeypatch.setenv('LBC_DEADLINE_DIR', str(tmp_path))
    with open(deadline_file('dagger'), 'w') as f:
        f.write('not a number')
    assert not wall_deadline_passed('dagger')


def test_resident_loop_cuts_at_deadline(tmp_path, monkeypatch):
    """train_resident stops at the epoch boundary once (a) the deadline
    passed and (b) epoch >= deadline_min_epoch, and force-saves."""
    from lbc_tpu.train import resident

    monkeypatch.setenv('LBC_DEADLINE_DIR', str(tmp_path))
    with open(deadline_file('image'), 'w') as f:
        f.write(str(time.time() - 1))

    saves = []

    def fake_save(st, epoch, force=False):
        saves.append((epoch, force))

    # stub the heavy pieces: the loop logic is what's under test
    monkeypatch.setattr(resident, 'make_resident_step',
                        lambda *a, **k: lambda s, d, key, p: (s, 0.0))
    monkeypatch.setattr(resident, 'make_resident_val_step',
                        lambda *a, **k: lambda s, d, start: 0.0)
    monkeypatch.setattr(resident, 'schedule_params', lambda *a: {})
    import jax.numpy as jnp

    class Data:
        rgb = jnp.zeros((4, 1, 1, 3))
        n_train = 4

    config = {'phase': 1, 'batch_size': 2, 'samples_per_epoch': 1,
              'max_epoch': 100, 'augment': False,
              'deadline_min_epoch': 3}
    _, history = resident.train_resident(
        config, state=None, tx=None, model=None, teacher_model=None,
        teacher_vars=None, data=Data(), save_fn=fake_save)
    # epochs 0,1,2 run normally; epoch 3 is the first allowed cut
    assert [e for e, _, _ in history] == [0, 1, 2, 3]
    assert saves[-1] == (3, True)
