import numpy as np

from laghos_tpu.sedov import SedovSolution


def test_alpha_sphere_gamma14():
    # Known similarity-energy constant for the spherical gamma=1.4 blast
    # (Kamm & Timmes LA-UR-00-6055, Table: alpha ~ 0.851)
    s = SedovSolution(3, 1.4, 1.0, 1.0)
    assert abs(s.alpha - 0.851) < 2e-3


def test_alpha_cylinder_gamma14():
    s = SedovSolution(2, 1.4, 1.0, 1.0)
    assert abs(s.alpha - 0.984) < 2e-3


def test_shock_jump_conditions():
    s = SedovSolution(3, 1.4, 1.0, 1.0)
    s.set_time(0.5)
    # strong-shock density jump (gamma+1)/(gamma-1) = 6 just behind shock
    r = np.array([s.r2 * (1 - 1e-9)])
    rho, v, P = s.eval(r)
    assert abs(rho[0] / s.rho1 - 6.0) < 1e-3
    # ahead of the shock: undisturbed
    rho, v, P = s.eval(np.array([s.r2 * 1.01]))
    assert rho[0] == 1.0 and v[0] == 0.0 and P[0] == 0.0


def test_profile_monotone_and_finite():
    s = SedovSolution(3, 1.4, 1.0, 1.0)
    s.set_time(1.0)
    r = np.linspace(1e-3, s.r2 * 1.2, 200)
    rho, v, P = s.eval(r)
    assert np.all(np.isfinite(rho)) and np.all(np.isfinite(v))
    assert np.all(rho >= 0) and np.all(P >= -1e-14)
