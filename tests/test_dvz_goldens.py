"""Analytic golden values for the DVZ deformation/control math.

Hand-derived pins for ``algorithms/dvz.py`` against the reference
semantics (``/root/reference/src/kompass_core/algorithms/dvz.py:146-498``,
Lapierre 2007). Setup chosen so everything is exact in closed form:

robot radius 0.5, side_margin_width_ratio 1.0 -> minor radius b = 1.0;
min_front_margin 1.0, speed 0, max_vel 1.0 -> major radius a = 1.0 (the
zone is a CIRCLE), center shift ax = -2/3, a' = 1.0, ax' = -2/3.

Undeformed radius r(alpha) solves the shifted-circle quadratic
A r^2 + B r + C = 0 with A = 1, B = 2 ax cos(alpha), C = ax^2 - 1:
  r(0)      = (4/3 + 2) / 2 = 5/3
  r(pi/2)   = sqrt(5)/3
  r(pi)     = (-4/3 + 2) / 2 = 1/3
With a single intruding beam at alpha=0 and range 1.0:
  depth          = (5/3 - 1) / 1 = 2/3
  total_deform   = (2/3) / n          (n = 4 beams)
  orientation    = 0
  regulation     = 1 / (1 + K_I / 6)  (K_I = 5 -> 6/11)
Control goldens below follow the reference blending formulas verbatim.
"""

import math
from fractions import Fraction

import numpy as np
import pytest

from kompass_core_tpu.algorithms.dvz import (
    DeformableVirtualZone,
    DeformableVirtualZoneParams,
)
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
)


@pytest.fixture
def dvz():
    robot = Robot(
        robot_type="DIFFERENTIAL_DRIVE",
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.5, 0.4]),
    )
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=2.0, max_decel=2.0),
        omega_limits=AngularCtrlLimits(
            max_vel=3.0, max_acc=2.0, max_decel=2.0, max_steer=1.5
        ),
    )
    cfg = DeformableVirtualZoneParams(
        min_front_margin=1.0,
        K_linear=1.0,
        K_angular=1.0,
        K_I=5.0,
        side_margin_width_ratio=1.0,
    )
    z = DeformableVirtualZone(robot=robot, ctrl_limits=limits, config=cfg)
    z.update_zone_size(robot_speed=0.0)
    return z


def test_zone_geometry_exact(dvz):
    # a = (1 + 0/1) * 1 = 1, b = 0.5 + 0.5 = 1, ax = -2/3 (reference
    # update_zone_size, dvz.py:146-165; _init_constant_zone_parameters,
    # :108-119)
    assert dvz.zone_major_radius == 1.0
    assert dvz.zone_minor_radius == 1.0
    np.testing.assert_allclose(dvz.zone_center_shift_x, -2.0 / 3.0, rtol=1e-15)
    # regularizations (reference :130-144): angular = 2/(pi/4 * 1/4),
    # linear = 2/(1/4)
    np.testing.assert_allclose(dvz.angular_regulation, 32.0 / math.pi, rtol=1e-15)
    np.testing.assert_allclose(dvz.linear_regulation, 8.0, rtol=1e-15)


def test_undeformed_radius_closed_form(dvz):
    r = dvz._undeformed_radii(np.array([0.0, math.pi / 2, math.pi, -math.pi / 2]))
    np.testing.assert_allclose(
        r, [5.0 / 3.0, math.sqrt(5) / 3.0, 1.0 / 3.0, math.sqrt(5) / 3.0], rtol=1e-12
    )


def test_single_beam_deformation_and_controls(dvz):
    angles = np.array([0.0, math.pi / 2, math.pi, -math.pi / 2])
    ranges = np.array([1.0, 10.0, 10.0, 10.0])
    dvz.set_scan_values(ranges, angles)
    dvz.get_total_deformation()

    np.testing.assert_allclose(dvz.total_deformation, 1.0 / 6.0, rtol=1e-12)
    np.testing.assert_allclose(dvz.deformation_orientation, 0.0, atol=1e-12)
    np.testing.assert_allclose(dvz.deformation_regulation, 6.0 / 11.0, rtol=1e-12)

    # linear (reference :438-465): acc = -K * (1/6) * 8 / (0 + 0.01)
    # = -400/3; ctrl = acc*0.1 + 0.5 = -40/3 + 1/2; blended with
    # regulation 6/11 against ref 0.8
    acc = Fraction(-400, 3)
    ctrl = acc * Fraction(1, 10) + Fraction(1, 2)
    expected_lin = Fraction(5, 11) * ctrl + Fraction(6, 11) * Fraction(4, 5)
    got = dvz.compute_linear_control(
        ref_control_linear=0.8, old_control=0.5, time_step=0.1
    )
    np.testing.assert_allclose(got, float(expected_lin), rtol=1e-9)

    # angular (reference :477-498): inv_angle = wrap(pi - 0) = -pi
    # (the reference wrap maps pi -> -pi); ctrl = -1 * (-pi) * (1/6)
    # * 32/pi = 16/3; blended: 5/11 * 16/3 + 6/11 * 0.2
    expected_ang = Fraction(5, 11) * Fraction(16, 3) + Fraction(6, 11) * Fraction(
        1, 5
    )
    got_ang = dvz.compute_angular_control(ref_control_angular=0.2)
    np.testing.assert_allclose(got_ang, float(expected_ang), rtol=1e-9)


def test_symmetric_intrusion_centers_orientation(dvz):
    # equal intrusions at +-alpha: convert_to_0_2pi(-a) = 2pi - a, so the
    # depth-weighted mean orientation is exactly pi -> inv_angle = 0 ->
    # the corrective angular term vanishes and only the regulation
    # blending remains (reference :399-401,477-489)
    a = 0.4
    angles = np.array([a, -a])
    r = float(dvz._undeformed_radii(np.array([a]))[0])
    dvz.set_scan_values(np.array([0.5 * r, 0.5 * r]), angles)
    dvz.get_total_deformation()
    np.testing.assert_allclose(dvz.deformation_orientation, math.pi, rtol=1e-12)
    reg = dvz.deformation_regulation
    got = dvz.compute_angular_control(ref_control_angular=0.3)
    np.testing.assert_allclose(got, reg * 0.3, rtol=1e-9)


def test_no_intrusion_passthrough(dvz):
    angles = np.linspace(-math.pi, math.pi, 36, endpoint=False)
    dvz.set_scan_values(np.full(36, 50.0), angles)
    dvz.get_total_deformation()
    assert dvz.total_deformation == 0.0
    assert dvz.compute_linear_control(0.7, 0.1, 0.1) == 0.7
    assert dvz.compute_angular_control(0.4) == 0.4


def test_closer_obstacle_monotonically_stronger(dvz):
    angles = np.array([0.0])
    prev = None
    for rng in (1.5, 1.0, 0.5, 0.2):
        dvz.set_scan_values(np.array([rng]), angles)
        dvz.get_total_deformation()
        assert dvz.total_deformation > 0.0
        lin = dvz.compute_linear_control(0.8, 0.5, 0.1)
        if prev is not None:
            assert lin < prev  # closer -> stronger braking
        prev = lin
