"""Mean functions as design matrices from R-style formulas.

The reference builds its mean design matrix with patsy
(``GaussianProcess.py:485-515``) and keeps a separate symbolic
mean-function AST (``MeanFunction.py``) mainly for the GPU path.  Here a
small self-contained formula layer produces the design matrix directly:

* ``design_matrix(mean, inputs)`` -- the runtime entry point.  ``None`` /
  ``"0"`` / ``"-1"`` give a zero-column matrix (zero mean), ``"1"`` /
  ``"-0"`` a constant column, and any other string is parsed as an
  R-style formula over ``x[0] ... x[D-1]``.
* Formula surface: ``"y ~ a + b"`` (LHS stripped), implicit intercept
  (suppressed by ``+ 0`` or ``- 1``), ``+`` term joins, ``:`` products,
  ``*`` crossing (``a*b == a + b + a:b``), ``I(expr)`` literal arithmetic,
  and numpy-style expressions on ``x`` (e.g. ``"x[0] + I(x[0]**2)"``).

Documented boundary vs patsy: this covers the full NUMERIC surface (all
the reference's own demos/tests use), but patsy's categorical terms
(``C(x)`` dummy coding) and arbitrary-environment name lookup are not
supported -- GP emulator inputs are continuous simulator parameters.
``C(...)`` raises an explicit error rather than a generic name failure.

The design matrix is a plain array, so everything downstream stays
jittable; formula parsing happens once on the host at model-construction
time.
"""

import numpy as np

__all__ = ["design_matrix", "parse_formula", "n_mean_params"]


def _split_top_level(s, seps):
    """Split string on separator characters at parenthesis depth zero."""
    parts = []
    depth = 0
    current = ""
    current_sep = None
    out = []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if depth == 0 and ch in seps:
            out.append((current_sep, current))
            current = ""
            current_sep = ch
        else:
            current += ch
    out.append((current_sep, current))
    return [(sep, part.strip()) for sep, part in out]


def _expand_term(term):
    """Expand patsy-style ``*`` crossing into a list of ``:`` products.

    ``a*b`` -> ``[a, b, a:b]``; ``a:b`` stays a single product term.
    """
    pieces = _split_top_level(term, "*")
    if len(pieces) == 1:
        return [term.strip()]
    factors = [p for _, p in pieces]
    expanded = []
    # all non-empty subsets in patsy order: mains first, then interactions
    # (for two-way and higher crossings we emit mains + the full product of
    # each prefix, which covers the common a*b and a*b*c usage)
    from itertools import combinations

    for k in range(1, len(factors) + 1):
        for combo in combinations(factors, k):
            expanded.append(":".join(combo))
    return expanded


def parse_formula(formula):
    """Parse a formula string into ``(intercept, terms)``.

    ``intercept`` is a bool; ``terms`` is a list of product-term strings
    (each a ``:``-joined list of factors).
    """
    if "~" in formula:
        formula = formula.split("~", 1)[1]
    raw_terms = _split_top_level(formula, "+-")
    intercept = True
    terms = []
    for sep, term in raw_terms:
        if term == "":
            continue
        if term in ("0",):
            if sep in (None, "+"):
                intercept = False
            continue
        if term == "1":
            if sep == "-":
                intercept = False
            else:
                intercept = True
            continue
        if sep == "-":
            # term removal: drop matching previously-seen terms
            terms = [t for t in terms if t != term]
            continue
        for expanded in _expand_term(term):
            if expanded not in terms:
                terms.append(expanded)
    return intercept, terms


def _eval_factor(factor, x_data):
    """Evaluate one factor expression to a column vector."""
    namespace = {
        "x": x_data,
        "I": lambda v: v,
        "np": np,
        "log": np.log,
        "exp": np.exp,
        "sqrt": np.sqrt,
        "sin": np.sin,
        "cos": np.cos,
        "abs": np.abs,
        "__builtins__": {},
    }
    try:
        val = eval(factor, namespace)  # noqa: S307 - restricted namespace
    except Exception as exc:
        import re

        if isinstance(exc, NameError) and re.search(r"\bC\s*\(", factor):
            raise ValueError(
                "categorical terms (patsy 'C(...)') are not supported: "
                "mean formulas cover the numeric surface only (GP "
                "emulator inputs are continuous simulator parameters); "
                "offending term: '{}'".format(factor)
            )
        raise ValueError(
            "Provided mean function is invalid: could not evaluate "
            "term '{}': {}".format(factor, exc)
        )
    return np.asarray(val, dtype=np.float64)


def _eval_term(term, x_data, n):
    cols = None
    for _, factor in _split_top_level(term, ":"):
        val = _eval_factor(factor, x_data)
        val = np.broadcast_to(val, (n,)).astype(np.float64)
        cols = val if cols is None else cols * val
    return cols


def design_matrix(mean, inputs):
    """Design matrix for a mean specification (``GaussianProcess.py:485-515``).

    :param mean: ``None`` or a formula string.
    :param inputs: ``(n, D)`` input array.
    :returns: ``(n, M)`` numpy design matrix (M may be zero).
    """
    inputs = np.asarray(inputs)
    assert inputs.ndim == 2, "bad shape for inputs"
    n = inputs.shape[0]

    if mean is None or mean == "0" or mean == "-1":
        return np.zeros((n, 0))
    if mean == "1" or mean == "-0":
        return np.ones((n, 1))
    if not isinstance(mean, str):
        # allow a precomputed design matrix or callable for flexibility
        if callable(mean):
            dm = np.asarray(mean(inputs), dtype=np.float64)
        else:
            dm = np.asarray(mean, dtype=np.float64)
        if dm.shape[0] != n:
            raise ValueError("Provided design matrix is of the wrong shape")
        return dm

    intercept, terms = parse_formula(mean)
    x_data = inputs.T  # patsy convention: data={"x": inputs.T}
    cols = []
    if intercept:
        cols.append(np.ones(n))
    for term in terms:
        cols.append(_eval_term(term, x_data, n))
    if not cols:
        return np.zeros((n, 0))
    dm = np.stack(cols, axis=1)
    if dm.shape[0] != n:
        raise ValueError("Provided design matrix is of the wrong shape")
    return dm


def n_mean_params(mean, D):
    """Number of mean parameters for a formula with ``D`` inputs."""
    probe = np.zeros((2, D))
    probe[1] = 1.0
    return design_matrix(mean, probe).shape[1]


def design_matrix_fn(mean):
    """Return a *jittable* function ``x -> dm`` for a mean specification.

    Same semantics as ``design_matrix`` but the returned callable
    evaluates term expressions with jnp on traced arrays, so it can be
    used inside jitted sweeps (SMC, sharded HistoryMatching) where the
    query points are traced.
    """
    import jax.numpy as jnp

    if mean is None or mean == "0" or mean == "-1":
        return lambda x: jnp.zeros((x.shape[0], 0), dtype=x.dtype)
    if mean == "1" or mean == "-0":
        return lambda x: jnp.ones((x.shape[0], 1), dtype=x.dtype)
    if callable(mean):
        return mean
    if not isinstance(mean, str):
        raise ValueError(
            "jittable design matrices require a formula string, callable, or None"
        )

    intercept, terms = parse_formula(mean)

    def fn(x):
        n = x.shape[0]
        x_data = x.T
        namespace = {
            "x": x_data,
            "I": lambda v: v,
            "np": jnp,
            "log": jnp.log,
            "exp": jnp.exp,
            "sqrt": jnp.sqrt,
            "sin": jnp.sin,
            "cos": jnp.cos,
            "abs": jnp.abs,
            "__builtins__": {},
        }
        cols = []
        if intercept:
            cols.append(jnp.ones(n, dtype=x.dtype))
        for term in terms:
            col = None
            for _, factor in _split_top_level(term, ":"):
                val = jnp.broadcast_to(
                    jnp.asarray(eval(factor, dict(namespace))), (n,)
                ).astype(x.dtype)
                col = val if col is None else col * val
            cols.append(col)
        if not cols:
            return jnp.zeros((n, 0), dtype=x.dtype)
        return jnp.stack(cols, axis=1)

    return fn
