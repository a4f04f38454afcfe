"""Graph wiki samples — parity with example/wiki/graph/ and example/graph/
(D1/D2 coloring, MIS2, RCB partitioning)."""
import numpy as np

from tpukk.containers import generate_structured_laplacian
from tpukk.graph import (
    graph_color,
    graph_color_d2,
    graph_mis2,
    rcb,
    verify_coloring,
)


def main():
    A = generate_structured_laplacian(24, 24)
    colors = graph_color(A)
    print(f"D1 coloring: {colors.max()} colors, valid = {verify_coloring(A, colors)}")

    d2 = graph_color_d2(A)
    print(f"D2 coloring: {d2.max()} colors")

    roots = graph_mis2(A)
    print(f"MIS-2: {len(roots)} roots out of {A.nrows} vertices")

    pts = np.stack(np.meshgrid(np.arange(24), np.arange(24)), -1).reshape(-1, 2).astype(float)
    parts = rcb(pts, 4)
    print("RCB part sizes:", np.bincount(parts, minlength=4).tolist())


if __name__ == "__main__":
    main()
