"""Projectile simulator for the demos.

Physics: a projectile launched at 45 degrees with drag.  Inputs are the
log10 drag coefficient ``c`` (per unit mass) and the launch velocity
``v0``; output is the distance travelled when it lands.  Same physical
setup as the reference demo problem (``demos/projectile.py``) but
implemented independently with ``scipy.integrate.solve_ivp``.
"""

import numpy as np
from scipy.integrate import solve_ivp

__all__ = [
    "simulator",
    "simulator_multioutput",
    "print_results",
    "print_predictions",
    "print_errors",
]

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
    return float(_solve(params).y[0, -1])


def _solve(params):
    log_drag, v0 = float(params[0]), float(params[1])
    drag = 10.0**log_drag
    v_component = v0 / np.sqrt(2.0)
    return solve_ivp(
        _rhs,
        (0.0, 1.0e8),
        [0.0, 2.0, v_component, v_component],
        events=_hit_ground,
        args=(drag,),
        rtol=1e-8,
    )


def simulator_multioutput(params):
    """Two outputs: landing distance and landing speed.

    Multi-output counterpart of :func:`simulator` (the reference pairs
    the same two quantities in ``demos/projectile.py``).
    """
    sol = _solve(params)
    x, y, vx, vy = sol.y[:, -1]
    return float(x), float(np.sqrt(vx**2 + vy**2))


def print_results(inputs, values, variances):
    """Tabulate (input point, value, variance) triples."""
    print("{:>24} {:>14} {:>14}".format("input point", "value", "variance"))
    for pt, val, var in zip(inputs, values, variances):
        print(
            "({:8.3f}, {:8.2f})     {:>14} {:>14}".format(
                pt[0],
                pt[1],
                "{:12.4f}".format(val) if val != "" else "",
                "{:12.4g}".format(var) if var != "" else "",
            )
        )


def print_predictions(inputs, means, variances):
    """Tabulate predictive means and variances."""
    print("Predictions:")
    print_results(inputs, means, variances)


def print_errors(inputs, errors, variances):
    """Tabulate standard errors and report the mean squared error."""
    print("Validation standard errors:")
    print_results(inputs, errors, variances)
    errors = np.asarray(errors, dtype=float)
    print("Mean squared error: {}".format(np.mean(errors**2)))
