import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.constants import CMD_FOLLOW
from lbc_tpu.engine import (DrivingEnv, EnvConfig, bicycle_step,
                            stack_states)
from lbc_tpu.engine.lights import (GREEN, PHASE_S, RED, YELLOW, GREEN_S,
                                   light_states)


# ----------------------------------------------------------------- dynamics
@jax.jit
def _roll_dynamics(carry, controls):
    def body(c, u):
        pos, yaw, speed = c
        pos, yaw, speed = bicycle_step(pos, yaw, speed, u[0], u[1], u[2])
        return (pos, yaw, speed), speed
    return jax.lax.scan(body, carry, controls)


def _drive(n, steer, throttle, brake, speed0=0.0):
    carry = (jnp.zeros(2), jnp.asarray(0.0), jnp.asarray(speed0))
    controls = jnp.tile(jnp.array([steer, throttle, brake]), (n, 1))
    (pos, yaw, speed), speeds = _roll_dynamics(carry, controls)
    return pos, yaw, speed, speeds


def test_bicycle_straight():
    pos, yaw, speed, _ = _drive(100, 0.0, 0.6, 0.0)
    # reaches a sensible cruise speed in 10 s with 0.6 throttle
    assert 4.0 < float(speed) < 12.0
    assert float(pos[0]) > 20.0
    assert abs(float(pos[1])) < 1e-3


def test_bicycle_brake_stops():
    _, _, speed, _ = _drive(20, 0.0, 0.0, 1.0, speed0=8.0)
    assert float(speed) == 0.0


def test_bicycle_turn_right_increases_yaw():
    pos, yaw, speed, _ = _drive(10, 0.3, 0.5, 0.0, speed0=5.0)
    assert float(yaw) > 0.1      # +steer turns toward +y (right-hand frame)
    assert float(pos[1]) > 0.0


def test_speed_pid_closed_loop():
    """Reference speed PID gains must track a 6 m/s setpoint on our
    longitudinal model (dynamics fidelity gate, SURVEY.md section 7.4)."""
    from lbc_tpu.control import pid_init, pid_step

    @jax.jit
    def roll(_):
        def body(carry, _):
            pos, yaw, speed, st = carry
            st, out = pid_step(st, 6.0 - speed, 1.0, 0.1, 2.5)
            throttle = jnp.clip(out, 0.0, 1.0)
            pos, yaw, speed = bicycle_step(pos, yaw, speed, 0.0, throttle,
                                           0.0)
            return (pos, yaw, speed, st), speed
        init = (jnp.zeros(2), jnp.asarray(0.0), jnp.asarray(0.0),
                pid_init(30))
        return jax.lax.scan(body, init, None, length=150)[1]

    speeds = np.asarray(roll(0))
    tail = speeds[-50:]
    assert abs(tail.mean() - 6.0) < 0.6
    assert tail.std() < 0.5


# ------------------------------------------------------------------- lights
def test_light_cycle():
    lj = jnp.array([0, 0, 0], jnp.int32)
    lp = jnp.array([0, 1, 2], jnp.int32)
    nph = jnp.array([3], jnp.int32)
    t0 = jnp.zeros(1)
    s0 = light_states(lj, lp, nph, t0, jnp.asarray(0, jnp.int32))
    np.testing.assert_array_equal(s0, [GREEN, RED, RED])
    s1 = light_states(lj, lp, nph, t0,
                      jnp.asarray(int((GREEN_S + 1) * 10), jnp.int32))
    np.testing.assert_array_equal(s1, [YELLOW, RED, RED])
    s2 = light_states(lj, lp, nph, t0,
                      jnp.asarray(int((PHASE_S + 1) * 10), jnp.int32))
    np.testing.assert_array_equal(s2, [RED, GREEN, RED])
    # exactly one non-red at any time
    ticks = jnp.arange(0, 500, 17, dtype=jnp.int32)
    states = jax.jit(jax.vmap(
        lambda t: light_states(lj, lp, nph, t0, t)))(ticks)
    assert np.all(np.sum(np.asarray(states) != RED, axis=1) == 1)


# ---------------------------------------------------------------------- env
@pytest.fixture(scope='module')
def env():
    return DrivingEnv(EnvConfig(town='Town01', n_vehicles=8,
                                n_pedestrians=16))


def test_reset_and_step(env):
    state = env.reset_np(seed=0, start=10, target=40)
    assert not bool(state.episode.done)
    step = jax.jit(env.step)
    control = jnp.array([0.0, 0.5, 0.0])
    for _ in range(20):
        state, obs = step(state, control)
    assert float(state.ego.speed) > 1.0
    assert obs['command'] in (1, 2, 3, 4)
    assert obs['position'].shape == (2,)
    # ego still on the road
    px = (np.asarray(state.ego.pos) - env.map_np.world_offset) * 5
    assert env.map_np.road_raster[int(px[1]), int(px[0])] > 0


def test_batched_step(env):
    states = [env.reset_np(seed=s, start=5 * s + 3, target=5 * s + 40)
              for s in range(4)]
    batch = stack_states(states)
    controls = jnp.tile(jnp.array([0.0, 0.4, 0.0]), (4, 1))
    state2, obs = env.step_batch(batch, controls)
    assert obs['speed'].shape == (4,)
    # batch-of-1 == scalar consistency
    s1, o1 = jax.jit(env.step)(states[1], controls[1])
    np.testing.assert_allclose(np.asarray(o1['position']),
                               np.asarray(obs['position'][1]), atol=1e-4)


def test_route_follower_advances(env):
    """Drive along the route with a heading controller: the checkpoint must
    advance and the command must come from route commands."""
    state = env.reset_np(seed=1, start=0, target=30)
    step = jax.jit(env.step)
    for _ in range(200):
        tgt = state.route.pos[jnp.minimum(state.route.next_idx,
                                          state.route.length - 1)]
        to = np.asarray(tgt) - np.asarray(state.ego.pos)
        yaw = float(state.ego.yaw)
        desired = np.arctan2(to[1], to[0])
        err = (desired - yaw + np.pi) % (2 * np.pi) - np.pi
        control = jnp.array([np.clip(1.2 * err, -1, 1), 0.6, 0.0])
        state, obs = step(state, control)
    assert int(state.route.next_idx) > 10
    assert float(obs['distance_to_goal']) < float(state.route.cumdist[
        state.route.length - 1])


def test_timeout_failure():
    env = DrivingEnv(EnvConfig(town='Town01'))
    state = env.reset_np(seed=2, start=0, target=3)
    # force a tiny timeout: park until failure
    state = state._replace(episode=state.episode._replace(
        timeout=jnp.asarray(5.0, jnp.float32)))
    step = jax.jit(env.step)
    for _ in range(8):
        state, obs = step(state, jnp.array([0.0, 0.0, 1.0]))
    assert bool(state.episode.done)
    assert not bool(state.episode.success)


def test_warmup_resets_clocks(env):
    states = [env.reset_np(seed=s, start=3, target=77) for s in range(2)]
    batch = stack_states(states)
    batch = env.warmup(batch, ticks=10)
    assert int(batch.episode.tick[0]) == 0
    # NPCs should have started moving during warmup
    assert float(jnp.max(batch.npc.speed)) >= 0.0


def test_npc_junction_entry_gate():
    """Anti-gridlock: an NPC approaching a junction boundary holds (brakes,
    pointer not advanced) while a vehicle occupies a CONFLICTING connector
    of that junction (crossing or merging path, maps/map_data.py conflict
    tables), and proceeds once the junction is clear. A vehicle on the
    NPC's own connector does not trip the gate — that is ordinary
    leader-following, handled by the hazard cone."""
    import numpy as np

    from lbc_tpu.engine.npc import npc_vehicle_step
    from lbc_tpu.engine.state import NPCVehicleState
    from lbc_tpu.maps import build_map_data

    m = build_map_data('Town01')
    md = jax.tree.map(jnp.asarray, m)
    wpj = np.asarray(m.wp_junction)
    wpc = np.asarray(m.wp_conn)
    # find a road wp whose successor is a junction wp (an entry boundary)
    # whose connector has at least one conflicting connector with a
    # waypoint to park the blocker on (hash pick 0 is deterministic here)
    entry = None
    for i in range(m.wp_pos.shape[0]):
        if wpj[i] >= 0 or int(m.wp_n_next[i]) < 1:
            continue
        nxts = [int(m.wp_next[i, k]) for k in range(int(m.wp_n_next[i]))]
        if not all(n >= 0 and wpj[n] >= 0 for n in nxts):
            continue
        j_wp = nxts[0]
        j_id = int(wpj[j_wp])
        # blocker connector must conflict with EVERY successor connector,
        # so the gate holds whichever branch the NPC's hash picks
        conf = ~0
        for n in nxts:
            conf &= int(m.junction_conflict[j_id, int(wpc[n])])
        if conf == 0:
            continue
        k_conf = conf.bit_length() - 1   # one conflicting connector
        cand = np.nonzero((wpj == j_id) & (wpc == k_conf))[0]
        if len(cand):
            entry = (i, j_wp, j_id, int(cand[len(cand) // 2]))
            break
    assert entry is not None
    i, j_wp, j_id, blocker_wp = entry
    entry_pos = m.wp_pos[i]
    yaw_to = float(np.arctan2(*(m.wp_pos[j_wp] - entry_pos)[::-1]))
    # approacher: 1.5 m before the boundary wp (inside NPC_REACH, so the
    # pointer would advance into the junction this tick if not gated)
    appr_pos = entry_pos - 1.5 * np.array([np.cos(yaw_to), np.sin(yaw_to)],
                                          np.float32)

    def make(blocker_speed, blocker_active):
        return NPCVehicleState(
            pos=jnp.asarray(np.stack([appr_pos, m.wp_pos[blocker_wp]]),
                            jnp.float32),
            yaw=jnp.asarray([yaw_to, 0.0], jnp.float32),
            speed=jnp.asarray([4.0, blocker_speed], jnp.float32),
            wp=jnp.asarray([i, blocker_wp], jnp.int32),
            active=jnp.asarray([True, blocker_active]))

    far = jnp.asarray([1e6, 1e6], jnp.float32)   # ego far away
    kw = dict(ego_pos=far, ego_yaw=jnp.asarray(0.0),
              walker_pos=jnp.zeros((1, 2)) + 1e6,
              walker_active=jnp.asarray([False]),
              light_state=jnp.zeros((m.light_pole_pos.shape[0],),
                                    jnp.int32),
              seed=jnp.asarray(0, jnp.uint32))

    # stopped blocker inside -> approacher must hold at the boundary
    held = npc_vehicle_step(make(0.0, True), md, **kw)
    assert int(held.wp[0]) == i              # pointer did not advance
    assert float(held.speed[0]) < 4.0        # braking

    # clear junction -> approacher advances into it at speed
    clear = npc_vehicle_step(make(0.0, False), md, **kw)
    assert int(np.asarray(wpj[int(clear.wp[0])])) >= 0   # pointer entered
    assert float(clear.speed[0]) >= float(held.speed[0])

    # ego reservation of the conflicting connector -> held exactly like a
    # committed vehicle (engine/env.py passes intended_connector's mask)
    res = npc_vehicle_step(
        make(0.0, False), md, **kw,
        ego_res_j=jnp.asarray(j_id, jnp.int32),
        ego_res_c=jnp.asarray(np.uint32(1) << np.uint32(k_conf)))
    assert int(res.wp[0]) == i
    # reservation of a NON-conflicting, non-successor connector (if one
    # exists) leaves entry open
    open_mask = 0
    n_k = m.junction_conflict.shape[1]
    succ_conns = {int(wpc[n]) for n in nxts}
    for k in range(n_k):
        if k in succ_conns:
            continue
        if all(not (int(m.junction_conflict[j_id, int(wpc[n])]) >> k) & 1
               for n in nxts):
            open_mask = 1 << k
            break
    if open_mask:
        ok = npc_vehicle_step(
            make(0.0, False), md, **kw,
            ego_res_j=jnp.asarray(j_id, jnp.int32),
            ego_res_c=jnp.asarray(np.uint32(open_mask)))
        assert int(np.asarray(wpj[int(ok.wp[0])])) >= 0


def test_npc_mutual_block_tiebreaker():
    """Two NPCs stopped inside a junction in each other's block corridor
    (crossing connectors) must not deadlock: the lower-index one ignores
    its mutual partner and pulls away while the other stays held
    (engine/npc.py mutual-block tiebreaker). Without it, such pairs froze
    whole dense-suite towns via entry-gate spillback."""
    import numpy as np

    from lbc_tpu.engine.npc import npc_vehicle_step
    from lbc_tpu.engine.state import NPCVehicleState
    from lbc_tpu.maps import build_map_data

    m = build_map_data('Town01')
    md = jax.tree.map(jnp.asarray, m)
    wpj = np.asarray(m.wp_junction)
    j_wp = int(np.nonzero(wpj >= 0)[0][0])

    p0 = np.asarray(m.wp_pos[j_wp], np.float32)
    kw = dict(ego_pos=jnp.asarray([1e6, 1e6], jnp.float32),
              ego_yaw=jnp.asarray(0.0),
              walker_pos=jnp.zeros((1, 2)) + 1e6,
              walker_active=jnp.asarray([False]),
              light_state=jnp.zeros((m.light_pole_pos.shape[0],),
                                    jnp.int32),
              seed=jnp.asarray(0, jnp.uint32))

    def pair(yaw1_deg):
        return NPCVehicleState(
            pos=jnp.asarray(np.stack([p0, p0 + [4.0, 1.0]]), jnp.float32),
            yaw=jnp.asarray([0.0, np.radians(yaw1_deg)], jnp.float32),
            speed=jnp.asarray([0.0, 0.0], jnp.float32),
            wp=jnp.asarray([j_wp, j_wp], jnp.int32),
            active=jnp.asarray([True, True]))

    # head-on corridor pair (yaw diff 166 deg) and crossing-cone pair
    # (yaw diff 120 deg, mutual imminent cones)
    for yaw1 in (194.0, 240.0):
        out = pair(yaw1)
        for _ in range(20):
            out = npc_vehicle_step(out, md, **kw)
        assert float(out.speed[0]) > 0.3, yaw1   # priority car pulled away
        # partner stayed held while the priority car was still close
        one = npc_vehicle_step(pair(yaw1), md, **kw)
        assert float(one.speed[1]) == 0.0, yaw1


def test_npc_speed_dependent_following_gap():
    """Car-following contract (engine/npc.py NPC_GAP_BASE/HEADWAY): an NPC
    closing on a stopped leader at cruise speed must stop without contact
    (center gap stays > the 4.7 m bbox length), and the standing queue
    must pack tighter than the old fixed 7.5 m cone — dense-suite queue
    drainage depends on the tight pack, NoCrash safety on the no-contact
    half (tools/sweep_traffic.py measured 3-4/6 ego collisions with a
    fixed 6.0 m cone)."""
    import numpy as np

    from lbc_tpu.engine.npc import npc_vehicle_step
    from lbc_tpu.engine.state import NPCVehicleState
    from lbc_tpu.maps import build_map_data

    m = build_map_data('Town01')
    md = jax.tree.map(jnp.asarray, m)
    wpj = np.asarray(m.wp_junction)

    # a straight >=25-wp single-successor road chain
    chain = None
    for i in range(m.wp_pos.shape[0]):
        if wpj[i] >= 0 or int(m.wp_n_next[i]) != 1:
            continue
        c = [i]
        while (len(c) < 26 and int(m.wp_n_next[c[-1]]) == 1
               and wpj[int(m.wp_next[c[-1], 0])] < 0):
            c.append(int(m.wp_next[c[-1], 0]))
        if len(c) < 26:
            continue
        v = m.wp_pos[c[-1]] - m.wp_pos[c[0]]
        if np.linalg.norm(v) > 24.0:     # nearly straight
            chain = c
            break
    assert chain is not None
    p0 = np.asarray(m.wp_pos[chain[0]], np.float32)
    heading = float(np.arctan2(*(m.wp_pos[chain[5]] - p0)[::-1]))
    leader_pos = np.asarray(m.wp_pos[chain[22]], np.float32)

    # the stationary leader is the EGO (never moves, always blocks)
    state = NPCVehicleState(
        pos=jnp.asarray(p0[None], jnp.float32),
        yaw=jnp.asarray([heading], jnp.float32),
        speed=jnp.asarray([5.1], jnp.float32),
        wp=jnp.asarray([chain[1]], jnp.int32),
        active=jnp.asarray([True]))
    kw = dict(ego_pos=jnp.asarray(leader_pos, jnp.float32),
              ego_yaw=jnp.asarray(heading),
              walker_pos=jnp.zeros((1, 2)) + 1e6,
              walker_active=jnp.asarray([False]),
              light_state=jnp.zeros((m.light_pole_pos.shape[0],),
                                    jnp.int32),
              seed=jnp.asarray(0, jnp.uint32))

    step = jax.jit(lambda s: npc_vehicle_step(s, md, **kw))
    min_gap = 1e9
    for _ in range(150):
        state = step(state)
        gap = float(jnp.linalg.norm(jnp.asarray(leader_pos) - state.pos[0]))
        min_gap = min(min_gap, gap)
    assert min_gap > 4.8, f'contact: min center gap {min_gap:.2f} m'
    assert min_gap < 7.4, f'queue too sparse: {min_gap:.2f} m'
    assert float(state.speed[0]) < 0.3   # settled, not oscillating


def test_walker_confinement_teleport():
    """A walker boxed into a pocket (pacing, never speed-stuck) must
    teleport out via the confinement rule once it has spent
    CONFINED_TICKS within CONFINED_RADIUS of its anchor while on the
    road (engine/walkers.py). Without it, pocketed walkers sit in every
    queued car's hazard cone forever (round-4 dense-suite audit)."""
    import numpy as np

    from lbc_tpu.engine.walkers import (CONFINED_TICKS, walker_step)
    from lbc_tpu.engine.state import WalkerState
    from lbc_tpu.maps import build_map_data

    m = build_map_data('Town01')
    md = jax.tree.map(jnp.asarray, m)
    # a point on the road surface
    road = np.asarray(m.road_raster)
    ys, xs = np.nonzero(road)
    k = len(ys) // 2
    p0 = np.array([xs[k] / 5.0, ys[k] / 5.0], np.float32) \
        + np.asarray(m.world_offset)

    # target far away but walker surrounded by stopped vehicles on all
    # sides (inflated OBBs block every candidate step)
    boxes = p0[None] + np.array(
        [[3.0, 0.0], [-3.0, 0.0], [0.0, 3.0], [0.0, -3.0]], np.float32)
    st = WalkerState(
        pos=jnp.asarray(p0[None]),
        yaw=jnp.zeros((1,)),
        speed=jnp.ones((1,)) * 1.5,
        target=jnp.asarray((p0 + np.array([40.0, 0.0]))[None]),
        target_idx=jnp.zeros((1,), jnp.int32),
        stuck_ticks=jnp.zeros((1,), jnp.int32),
        anchor=jnp.asarray(p0[None]),
        anchor_ticks=jnp.zeros((1,), jnp.int32),
        active=jnp.asarray([True]))

    key = jax.random.PRNGKey(0)
    step = jax.jit(lambda s, k: walker_step(
        s, md, jnp.asarray(p0 + 50.0), k,
        vehicle_pos=jnp.asarray(boxes),
        vehicle_active=jnp.ones((4,), bool),
        vehicle_speed=jnp.zeros((4,)),
        ego_speed=jnp.asarray(0.0),
        vehicle_yaw=jnp.zeros((4,)),
        ego_yaw=jnp.asarray(0.0)))
    for t in range(CONFINED_TICKS + 25):
        key, k1 = jax.random.split(key)
        st = step(st, k1)
        if float(jnp.linalg.norm(st.pos[0] - p0)) > 5.0:
            break
    # walker escaped the pocket (teleported by the confinement rule)
    assert float(jnp.linalg.norm(st.pos[0] - p0)) > 5.0


def test_npc_held_only_by_ego_excluded_from_expert_hold():
    """ADVICE r4: an NPC stopped inside a junction whose ONLY blocker is
    the ego must be flagged by npc_vehicle_step(with_aux=True) and dropped
    from the occupancy the expert's junction-entry hold reads — otherwise
    the ego holds at the entry for an NPC that is itself waiting for the
    ego, a cycle neither can leave. An NPC also blocked by ANOTHER
    stopped NPC keeps occupying (the ego must still wait for that one)."""
    import numpy as np

    from lbc_tpu.engine.npc import junction_occupancy, npc_vehicle_step
    from lbc_tpu.engine.state import NPCVehicleState
    from lbc_tpu.maps import build_map_data

    m = build_map_data('Town01')
    md = jax.tree.map(jnp.asarray, m)
    wpj = np.asarray(m.wp_junction)
    j_wp = int(np.nonzero(wpj >= 0)[0][0])
    j_id = int(wpj[j_wp])
    p0 = np.asarray(m.wp_pos[j_wp], np.float32)

    def run(ego_ahead, leader_active):
        # NPC 0: stopped at a junction waypoint; NPC 1: optional stopped
        # leader dead ahead inside the following cone
        st = NPCVehicleState(
            pos=jnp.asarray(np.stack([p0, p0 + [4.5, 0.0]]), jnp.float32),
            yaw=jnp.asarray([0.0, 0.0], jnp.float32),
            speed=jnp.asarray([0.0, 0.0], jnp.float32),
            wp=jnp.asarray([j_wp, j_wp], jnp.int32),
            active=jnp.asarray([True, leader_active]))
        ego_pos = (p0 + [5.0, 0.0] if ego_ahead
                   else np.asarray([1e6, 1e6], np.float32))
        out, aux = npc_vehicle_step(
            st, md,
            ego_pos=jnp.asarray(ego_pos, jnp.float32),
            ego_yaw=jnp.asarray(0.0),
            walker_pos=jnp.zeros((1, 2)) + 1e6,
            walker_active=jnp.asarray([False]),
            light_state=jnp.zeros((m.light_pole_pos.shape[0],), jnp.int32),
            seed=jnp.asarray(0, jnp.uint32), with_aux=True)
        return out, aux

    # ego dead ahead, no other blocker -> flagged, occupancy bit drops
    out, aux = run(ego_ahead=True, leader_active=False)
    assert bool(aux['held_only_by_ego'][0])
    occ_full, _ = junction_occupancy(md, out.wp, out.active)
    occ_expert, _ = junction_occupancy(
        md, out.wp, out.active & ~aux['held_only_by_ego'])
    assert int(occ_full[j_id]) != 0
    assert int(occ_expert[j_id]) == 0

    # ego far away -> nothing to flag
    _, aux = run(ego_ahead=False, leader_active=False)
    assert not bool(aux['held_only_by_ego'][0])

    # ego ahead AND a stopped NPC leader ahead -> NOT only-by-ego: the
    # expert must still hold for this occupant
    _, aux = run(ego_ahead=True, leader_active=True)
    assert not bool(aux['held_only_by_ego'][0])
