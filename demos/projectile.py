"""Projectile simulator for the demos.

Physics: a projectile launched at 45 degrees with drag.  Inputs are the
log10 drag coefficient ``c`` (per unit mass) and the launch velocity
``v0``; output is the distance travelled when it lands.  Same physical
setup as the reference demo problem (``demos/projectile.py``) but
implemented independently with ``scipy.integrate.solve_ivp``.
"""

import numpy as np
from scipy.integrate import solve_ivp

__all__ = ["simulator", "print_results"]

G = 9.8  # m/s^2


def _rhs(t, state, drag):
    x, y, vx, vy = state
    speed = np.sqrt(vx**2 + vy**2)
    return [vx, vy, -drag * vx * speed, -G - drag * vy * speed]


def _hit_ground(t, state, drag):
    return state[1]


_hit_ground.terminal = True
_hit_ground.direction = -1


def simulator(params):
    """Distance travelled by the projectile.

    :param params: array ``[log10_drag, v0]``.
    :returns: landing distance (m).
    """
    log_drag, v0 = float(params[0]), float(params[1])
    drag = 10.0**log_drag
    v_component = v0 / np.sqrt(2.0)
    sol = solve_ivp(
        _rhs,
        (0.0, 1.0e8),
        [0.0, 2.0, v_component, v_component],
        events=_hit_ground,
        args=(drag,),
        rtol=1e-8,
    )
    return float(sol.y[0, -1])


def print_results(inputs, errors, variances):
    """Tabulate validation errors."""
    print("Validation results:")
    print("{:>24} {:>12} {:>12}".format("input point", "std error", "variance"))
    for pt, err, var in zip(inputs, errors, variances):
        print(
            "({:8.3f}, {:8.2f})       {:12.4f} {:12.4g}".format(
                pt[0], pt[1], err, var
            )
        )
