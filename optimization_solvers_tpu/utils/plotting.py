"""3-D surface / iterate-trajectory plots (reference
``/root/reference/src/plotter_3d.rs``: plotly HTML with a surface mesh and
scatter traces of solver iterates, used by
``examples/quadratic_with_plots.rs:50-58``).

This environment has no plotly package, so :class:`Plotter3d` emits a
self-contained HTML document that inlines the trace data as JSON and loads
plotly.js from the CDN (the reference's HTML output does the same).  A
matplotlib PNG fallback is provided for fully-offline viewing.
"""

from __future__ import annotations

import json
from typing import Callable, Sequence

import numpy as np

_HTML_TEMPLATE = """<!DOCTYPE html>
<html>
<head><meta charset="utf-8"/>
<script src="https://cdn.plot.ly/plotly-2.32.0.min.js"></script></head>
<body>
<div id="plot" style="width:1600px;height:1000px;"></div>
<script>
Plotly.newPlot('plot', {traces}, {layout});
</script>
</body>
</html>
"""


class Plotter3d:
    """Builder mirroring ``Plotter3d::{new,append_plot,append_scatter_points,
    build}`` (``plotter_3d.rs:13-103``)."""

    def __init__(self, xmin: float, xmax: float, ymin: float, ymax: float,
                 mesh_size: int = 100):
        self.mesh_x = np.linspace(xmin, xmax, mesh_size)
        self.mesh_y = np.linspace(ymin, ymax, mesh_size)
        self._traces: list[dict] = []

    def with_mesh_x(self, mesh_x: Sequence[float]) -> "Plotter3d":
        self.mesh_x = np.asarray(mesh_x)
        return self

    def with_mesh_y(self, mesh_y: Sequence[float]) -> "Plotter3d":
        self.mesh_y = np.asarray(mesh_y)
        return self

    def append_plot(self, f: Callable[[np.ndarray], float], name: str = "f"
                    ) -> "Plotter3d":
        """Surface trace of a 2-D objective over the mesh
        (``plotter_3d.rs:39-64``)."""
        z = [[float(f(np.array([x, y]))) for x in self.mesh_x]
             for y in self.mesh_y]
        self._traces.append({
            "type": "surface",
            "x": self.mesh_x.tolist(),
            "y": self.mesh_y.tolist(),
            "z": z,
            "name": name,
            "opacity": 0.85,
        })
        return self

    def append_scatter_points(self, f: Callable[[np.ndarray], float],
                              points: Sequence[np.ndarray],
                              name: str = "iterates") -> "Plotter3d":
        """Scatter trace of solver iterates lifted onto the surface
        (``plotter_3d.rs:65-88``)."""
        pts = [np.asarray(p) for p in points]
        self._traces.append({
            "type": "scatter3d",
            "mode": "lines+markers",
            "x": [float(p[0]) for p in pts],
            "y": [float(p[1]) for p in pts],
            "z": [float(f(p)) for p in pts],
            "name": name,
            "marker": {"size": 4},
        })
        return self

    def build(self, filename: str) -> None:
        """Write the HTML document (``plotter_3d.rs:100-102``)."""
        html = _HTML_TEMPLATE.format(
            traces=json.dumps(self._traces),
            layout=json.dumps({"width": 1600, "height": 1000}),
        )
        with open(filename, "w") as fh:
            fh.write(html)

    def build_png(self, filename: str) -> None:
        """Offline fallback: render the same traces with matplotlib."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(12, 8))
        ax = fig.add_subplot(111, projection="3d")
        for tr in self._traces:
            if tr["type"] == "surface":
                X, Y = np.meshgrid(tr["x"], tr["y"])
                ax.plot_surface(X, Y, np.asarray(tr["z"]), alpha=0.6,
                                cmap="viridis")
            else:
                ax.plot(tr["x"], tr["y"], tr["z"], "o-", label=tr["name"])
        if any(t["type"] != "surface" for t in self._traces):
            ax.legend()
        fig.savefig(filename, dpi=120)
        plt.close(fig)
