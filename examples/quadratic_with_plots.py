"""Like quadratic.rs but collecting the iterate trajectory and writing the
plotly surface + scatter HTML (reference examples/quadratic_with_plots.rs)."""
from common import *

import numpy as np
from optimization_solvers_tpu.utils import Plotter3d

M = jnp.array([[1.0, 0.0], [0.0, 90.0]])
f = lambda x: x @ (M @ x)
res, xs, fs = solvers.minimize_recorded(
    solvers.BFGS(tol=1e-6), ls.MoreThuente(),
    make_oracle(f), jnp.array([3.0, 2.0]), max_iter=100)
report("quadratic_with_plots", res, f)

k = int(res.iterations)
f_np = lambda p: float(p[0]**2 * M[0, 0] + M[1, 1] * p[1]**2)
(Plotter3d(-4, 4, -4, 4, mesh_size=60)
 .append_plot(f_np, name="x^T M x")
 .append_scatter_points(f_np, [np.asarray(x) for x in xs[: k + 1]])
 .build("quadratic_with_plots.html"))
print("wrote quadratic_with_plots.html")
