"""Standalone CostEvaluator (given trajectories) vs the serial oracle.

`evaluate_trajectory_costs` is the decoupled equivalent of the reference's
``CostEvaluator::getMinTrajectoryCost`` (``cost_evaluator.cpp:49-108``):
arbitrary trajectory/velocity batches in, weighted costs + first-min
winner out. Cross-checked here against the independent oracle cost
transcriptions on reference-style "heavy" samples (center path +
sinusoidal fluctuation pairs, ``benchmark_runner.cpp:36-100``) — the
exact structure of the reference's CostEvaluator_5k_Trajs workload at a
test-sized S x T.
"""

import numpy as np

import jax.numpy as jnp

from kompass_core_tpu.ops.solver import SolverParams, get_cost_evaluator

from oracle import reference_impl as oracle


def _heavy_samples(S, T, dt=0.05, v1=1.0, max_fluct=0.5):
    i = np.arange(T, dtype=np.float64)
    px = np.zeros((S, T))
    py = np.zeros((S, T))
    vels = np.zeros((S, T - 1, 3))
    px[0] = dt * v1 * i
    vels[0, :, 0] = v1
    pairs = (S - 1) // 2
    amp = max_fluct / max(pairs, 1)
    fl = np.sin(2 * np.pi * i / T)
    for p in range(1, pairs + 1):
        a = p * amp
        px[2 * p - 1] = dt * v1 * i
        py[2 * p - 1] = dt * (a * fl) * i
        vels[2 * p - 1, :, 0] = v1
        vels[2 * p - 1, :, 1] = a * fl[:-1]
        px[2 * p] = dt * v1 * i
        vels[2 * p, :, 0] = v1
        vels[2 * p, :, 2] = a * fl[:-1]
    return px, py, vels


def test_standalone_evaluator_matches_oracle():
    S, T = 9, 40
    px, py, vels = _heavy_samples(S, T)
    n_seg = 120
    s = np.linspace(0.0, 3.0, n_seg)
    G = 128
    seg_x = np.full(G, 1e8, np.float32)
    seg_y = np.full(G, 1e8, np.float32)
    seg_arc = np.zeros(G, np.float32)
    seg_x[:n_seg] = s
    seg_y[:n_seg] = 0.0
    seg_arc[:n_seg] = s
    rng = np.random.default_rng(5)
    n_obs = 30
    obs = np.full((64, 2), 1e8, np.float32)
    obs[:n_obs] = rng.uniform(-1, 3, (n_obs, 2))

    weights = {
        "reference_path_distance_weight": 1.0,
        "goal_distance_weight": 1.0,
        "obstacles_distance_weight": 0.7,
        "smoothness_weight": 1.0,
        "jerk_weight": 1.0,
    }
    acc = (3.0, 3.0, 3.0)
    params = SolverParams.create(
        time_step=0.05,
        robot_radius=0.3,
        collision_margin=0.05,
        weights=weights,
        acc_limits=acc,
        max_obstacles_dist=10.0 / 3,
    )
    res = get_cost_evaluator()(
        params,
        jnp.asarray(px, jnp.float32),
        jnp.asarray(py, jnp.float32),
        jnp.asarray(vels, jnp.float32),
        jnp.asarray(obs),
        jnp.int32(n_obs),
        jnp.asarray(seg_x),
        jnp.asarray(seg_y),
        jnp.asarray(seg_arc),
        jnp.int32(n_seg),
        jnp.float32(s[-1]),
        jnp.float32(s[-1]),
        jnp.int32(T),
    )
    got = np.asarray(res.costs)

    expected = np.zeros(S)
    for k in range(S):
        c = 0.0
        c += weights["goal_distance_weight"] * oracle.goal_cost(
            px[k], py[k], s, np.zeros(n_seg), s, s[-1]
        )
        c += weights["reference_path_distance_weight"] * oracle.path_cost(
            px[k], py[k], s, np.zeros(n_seg), s[-1]
        )
        c += weights["obstacles_distance_weight"] * oracle.obstacles_cost(
            px[k], py[k], obs[:n_obs], 10.0 / 3
        )
        c += weights["smoothness_weight"] * oracle.smoothness_cost(
            vels[k, :, 0], vels[k, :, 1], vels[k, :, 2], acc
        )
        c += weights["jerk_weight"] * oracle.jerk_cost(
            vels[k, :, 0], vels[k, :, 1], vels[k, :, 2], acc
        )
        expected[k] = c
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    assert int(res.best_index) == int(np.argmin(expected))


def test_with_obstacles_false_elides_obstacle_cost():
    S, T = 5, 20
    px, py, vels = _heavy_samples(S, T)
    G = 128
    s = np.linspace(0.0, 1.0, 50)
    seg_x = np.full(G, 1e8, np.float32)
    seg_y = np.full(G, 1e8, np.float32)
    seg_arc = np.zeros(G, np.float32)
    seg_x[:50] = s
    seg_y[:50] = 0.0
    seg_arc[:50] = s
    obs = np.zeros((64, 2), np.float32)  # obstacle AT the path
    params = SolverParams.create(
        time_step=0.05,
        robot_radius=0.3,
        collision_margin=0.05,
        weights={
            "reference_path_distance_weight": 0.0,
            "goal_distance_weight": 0.0,
            "obstacles_distance_weight": 1.0,
            "smoothness_weight": 0.0,
            "jerk_weight": 0.0,
        },
        acc_limits=(3.0, 3.0, 3.0),
        max_obstacles_dist=10.0 / 3,
    )
    args = (
        jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
        jnp.asarray(vels, jnp.float32), jnp.asarray(obs), jnp.int32(64),
        jnp.asarray(seg_x), jnp.asarray(seg_y), jnp.asarray(seg_arc),
        jnp.int32(50), jnp.float32(1.0), jnp.float32(1.0), jnp.int32(T),
    )
    with_obs = get_cost_evaluator(True)(params, *args)
    without = get_cost_evaluator(False)(params, *args)
    assert float(np.asarray(with_obs.costs).max()) > 0.5
    np.testing.assert_allclose(np.asarray(without.costs), 0.0, atol=1e-7)
