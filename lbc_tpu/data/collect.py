"""Expert data collection, fully on-device rollouts -> episode store.

Capability parity with /root/reference/data_collector.py: the NoisyAgent
(drive/noise state machine with uniform steering noise, collection PID
gains, throttle damping by |steer|, data_collector.py:112-162), random
train weather + random pose pair per episode on the FullTown01-v0 suite,
episode acceptance only on terminal success/collision with >= 500 frames
(data_collector.py:209-212), and the same stored schema (rgb / birdview /
17-float measurements / expert control).

TPU-first: a batch of episodes is collected simultaneously; the BEV is
rendered and bit-packed inside the jitted rollout, so the host only
receives compact uint8 streams.
"""
from __future__ import annotations

from pathlib import Path
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.autopilot import expert_hazards
from ..constants import CMD_FOLLOW, TRAIN_WEATHERS
from ..control.pid import PIDState, pid_init, pid_step
from ..engine import DrivingEnv, EnvConfig, stack_states
from ..engine.rollout import make_rollout
from ..engine.routing import route_target
from .episode_store import write_episode

# collection PID gains (data_collector.py:129-130)
COLLECT_SPEED_PID = (0.5, 0.5 / 20, 0.1)
COLLECT_TURN_PID = (0.75, 1.0 / 20, 0.0)


class NoisyExpertState(NamedTuple):
    speed_pid: PIDState
    turn_pid: PIDState
    steps: jnp.ndarray        # () int32 frames in current phase
    in_noise: jnp.ndarray     # () bool
    noise_steer: jnp.ndarray  # () f32
    last_throttle: jnp.ndarray
    rng: jnp.ndarray          # (2,) PRNG key
    hold: jnp.ndarray         # () int32 brake-hold (agents/autopilot.py)


def noisy_expert_init(seed: int = 0) -> NoisyExpertState:
    return NoisyExpertState(
        speed_pid=pid_init(30), turn_pid=pid_init(30),
        steps=jnp.asarray(0, jnp.int32), in_noise=jnp.asarray(False),
        noise_steer=jnp.asarray(0.0), last_throttle=jnp.asarray(0.0),
        rng=jax.random.PRNGKey(seed), hold=jnp.asarray(0, jnp.int32))


def make_noisy_expert(n_drive: int = 100, n_noise: int = 0,
                      target_speed: float = 6.0):
    """n_noise = 0 reproduces the shipped 100%-drive config
    (data_collector.py:121)."""

    def step(map_data, env_state, obs, agent: NoisyExpertState):
        ego = env_state.ego
        target_pos, target_cmd = route_target(env_state.route)
        ox, oy = jnp.cos(ego.yaw), jnp.sin(ego.yaw)
        d = target_pos - ego.pos
        theta = jnp.arctan2(-oy * d[0] + ox * d[1],
                            ox * d[0] + oy * d[1])
        turn_pid, steer = pid_step(agent.turn_pid, theta,
                                   *COLLECT_TURN_PID)
        tsp = jnp.where((target_cmd == 3) | (target_cmd == CMD_FOLLOW),
                        target_speed, target_speed * 0.75)
        speed_pid, throttle = pid_step(agent.speed_pid, tsp - ego.speed,
                                       *COLLECT_SPEED_PID)

        # identical hazard stack + brake-hold to the benchmark expert
        # (agents/autopilot.py) — the collected dataset must teach the
        # behavior the benchmark expert actually exhibits
        hazard, hold = expert_hazards(map_data, env_state, agent.hold)

        steer = jnp.clip(steer, -1.0, 1.0)
        # throttle damping by steering magnitude (data_collector.py:138)
        throttle = jnp.clip(throttle, 0.0, 1.0) \
            * jnp.maximum(1.0 - jnp.abs(steer), 0.25)
        real = jnp.where(hazard, jnp.array([0.0, 0.0, 1.0]),
                         jnp.stack([steer, throttle,
                                    jnp.zeros_like(steer)]))

        # drive/noise machine
        executed = jnp.where(
            agent.in_noise,
            jnp.stack([agent.noise_steer, agent.last_throttle,
                       jnp.zeros_like(agent.noise_steer)]),
            real)

        steps = agent.steps + 1
        phase_len = jnp.where(agent.in_noise, n_noise, n_drive)
        switch = (steps >= phase_len) & (n_noise > 0)
        key, sub = jax.random.split(agent.rng)
        new_noise = jax.random.uniform(sub, (), minval=-0.25, maxval=0.25)
        new_agent = NoisyExpertState(
            speed_pid=speed_pid, turn_pid=turn_pid,
            steps=jnp.where(switch, 0, steps),
            in_noise=jnp.where(switch, ~agent.in_noise, agent.in_noise),
            noise_steer=jnp.where(switch, new_noise, agent.noise_steer),
            last_throttle=jnp.where(switch, executed[1],
                                    agent.last_throttle),
            rng=key, hold=hold)
        return executed, new_agent, real

    return step


def _measurements(env_state, obs, control):
    """17-float layout (carla_utils.py:115-143); stored control is the
    expert's un-noised control (data_collector.py:200)."""
    ego_pos = obs['position']
    fwd = obs['orientation']
    vel = obs['velocity']
    acc = obs['acceleration']
    _, target_cmd = route_target(env_state.route)
    z = jnp.zeros(())
    return jnp.concatenate([
        ego_pos, z[None],                # position x, y, z
        fwd,                             # orientation x, y
        vel, z[None],                    # velocity x, y, z
        acc, z[None],                    # acceleration x, y, z
        target_cmd.astype(jnp.float32)[None],
        control,                         # steer, throttle, brake
        z[None], z[None],                # manual_gear_shift, gear
    ])


def collect_episodes(out_dir, n_episodes: int = 8,
                     frames_per_episode: int = 1000, seed: int = 0,
                     town: str = 'Town01', n_vehicles: int = 0,
                     n_pedestrians: int = 0, n_noise: int = 0,
                     batch_size: Optional[int] = None,
                     include_bev: bool = True, render_rgb: bool = False,
                     min_frames: int = 500, pose_pairs=None,
                     rgb_batched: Optional[bool] = None,
                     pallas_interpret: bool = False) -> int:
    """Collect accepted episodes into `out_dir`; returns #accepted."""
    from ..render.bev import render_bev_state
    from .episode_store import pack_birdview

    out_dir = Path(out_dir)
    env = DrivingEnv(EnvConfig(
        town=town, n_vehicles=n_vehicles, n_pedestrians=n_pedestrians,
        respawn_peds=False, route_resolution=1.0,
        threshold_before=7.5, threshold_after=5.0))
    agent_step = make_noisy_expert(n_noise=n_noise)

    # On TPU the RGB frames come from the fused Pallas camera kernel at
    # full batch (one pallas_call per tick instead of a vmapped per-env
    # XLA render — the old fused-XLA camera-in-scan crashed the worker).
    if rgb_batched is None:
        rgb_batched = jax.default_backend() == 'tpu'
    rgb_batched = render_rgb and rgb_batched
    if render_rgb:
        # import OUTSIDE the traced collect callback: executing the module
        # (with its jnp constant tables) during tracing leaks tracers
        from ..render.camera import render_camera_state

    def collect(env_state, obs, control, real_control):
        rec = {
            'measurements': _measurements(env_state, obs, real_control),
            'control': real_control,
            'done': env_state.episode.done,
        }
        if include_bev:
            bev = render_bev_state(env.map_data, env_state)
            packed = jnp.zeros(bev.shape[:2], jnp.uint8)
            for c in range(7):
                packed = packed | ((bev[..., c] > 0).astype(jnp.uint8)
                                   << c)
            rec['birdview_packed'] = packed
        if render_rgb and not rgb_batched:
            rec['rgb'] = (render_camera_state(env.map_data, env_state)
                          * 255).astype(jnp.uint8)
        return rec

    batch_size = batch_size or min(n_episodes, 8)
    if rgb_batched:
        from ..ops.camera_kernel import render_camera_state_pallas

        def agent_batched(map_data, env_states, obs, agent_states):
            return jax.vmap(
                lambda s, o, a: agent_step(map_data, s, o, a))(
                    env_states, obs, agent_states)

        def collect_batched(env_states, obs, control, aux):
            rec = jax.vmap(collect)(env_states, obs, control, aux)
            rec['rgb'] = (render_camera_state_pallas(
                env.map_data, env_states, interpret=pallas_interpret)
                * 255).astype(jnp.uint8)
            return rec
        collect_batched.batched = True
        rollout = make_rollout(env, agent_batched, frames_per_episode,
                               collect=collect_batched,
                               batched_agent=True)
    else:
        rollout = make_rollout(env, agent_step, frames_per_episode,
                               collect=collect)

    rng = np.random.RandomState(seed)
    accepted = 0
    ep_id = 0
    n_spawn = len(env.map_np.spawn_pos)
    while accepted < n_episodes:
        states, agents = [], []
        for b in range(batch_size):
            if pose_pairs is not None:
                start, target = pose_pairs[rng.randint(len(pose_pairs))]
            else:
                start, target = rng.randint(0, n_spawn, 2)
            weather = int(rng.choice(TRAIN_WEATHERS))
            try:
                st = env.reset_np(seed=seed * 1000 + ep_id + b,
                                  start=start, target=target,
                                  weather=weather)
            except ValueError:
                st = env.reset_np(seed=seed * 1000 + ep_id + b,
                                  start=0, target=50, weather=weather)
            states.append(st)
            agents.append(noisy_expert_init(seed * 77 + ep_id + b))
        batch = stack_states(states)
        if n_vehicles or n_pedestrians:
            batch = env.warmup(batch, ticks=50)
        agent_state = jax.tree.map(lambda *x: jnp.stack(x), *agents)

        final, _, metrics, recs = rollout(batch, agent_state)
        done = np.asarray(metrics.done)
        success = np.asarray(metrics.success)
        collided = np.asarray(metrics.collided)
        dones_t = np.asarray(recs['done'])          # (T, B)

        for b in range(batch_size):
            terminal = bool(done[b]) and (bool(success[b])
                                          or bool(collided[b]))
            n = int(np.argmax(dones_t[:, b])) if done[b] else \
                frames_per_episode
            n = n if n > 0 else frames_per_episode
            if not terminal or n < min_frames:
                continue
            kw = {}
            if include_bev:
                kw['birdview_packed'] = np.asarray(
                    recs['birdview_packed'][:n, b])
            if render_rgb:
                kw['rgb'] = np.asarray(recs['rgb'][:n, b])
            write_episode(
                out_dir / f'episode_{seed:03d}_{ep_id + b:05d}',
                measurements=np.asarray(recs['measurements'][:n, b]),
                control=np.asarray(recs['control'][:n, b]), **kw)
            accepted += 1
            if accepted >= n_episodes:
                break
        ep_id += batch_size
        if ep_id > n_episodes * 20:
            break  # safety: acceptance rate too low
    return accepted
