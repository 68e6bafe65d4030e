"""IO (reference ``src/io``: Read/Write in ASCII / ASCII-Matlab / Binary /
BinaryFlat / MatrixMarket, Print, Display/Spy visualizations, ColorMap).

Display/Spy use matplotlib when available (the reference's Qt5 widgets are
optional there too); binary round-trip = the reference's manual checkpoint
path (SURVEY §5 checkpoint/resume)."""

from __future__ import annotations

import sys
from typing import Optional, Union

import numpy as np

import jax.numpy as jnp

from ..core.distmatrix import DistMatrix, as_array
from ..sparse.csr import SparseMatrix
from ..sparse.io import read_matrix_market, write_matrix_market  # noqa: F401

Arr = Union[jnp.ndarray, DistMatrix]

FORMATS = ("ascii", "ascii_matlab", "binary", "binary_flat",
           "matrix_market")


def print_matrix(A: Arr, title: str = "", file=None) -> None:
    """Reference ``Print``: rank-0 formatted dump."""
    f = file or sys.stdout
    a = np.asarray(as_array(A))
    if title:
        f.write(title + "\n")
    if a.ndim == 1:
        a = a[:, None]
    for row in a:
        f.write(" ".join(f"{v: .6g}" for v in row) + "\n")
    f.flush()


def write(path: str, A: Arr, fmt: str = "binary", title: str = "A") -> None:
    """Reference ``Write`` (format enum ``types.hpp:548-556``)."""
    a = np.asarray(as_array(A))
    fmt = fmt.lower()
    if fmt == "ascii":
        np.savetxt(path, a)
    elif fmt == "ascii_matlab":
        with open(path, "w") as f:
            f.write(f"{title} = [\n")
            for row in np.atleast_2d(a):
                f.write(" ".join(repr(float(v)) for v in row) + ";\n")
            f.write("];\n")
    elif fmt == "binary":
        with open(path, "wb") as f:
            header = np.array(a.shape, np.int64)
            f.write(header.tobytes())
            f.write(np.ascontiguousarray(a).tobytes())
    elif fmt == "binary_flat":
        with open(path, "wb") as f:
            f.write(np.ascontiguousarray(a).tobytes())
    elif fmt == "matrix_market":
        write_matrix_market(path, SparseMatrix.from_dense(a))
    else:
        raise ValueError(f"unknown format {fmt!r}")


def read(path: str, fmt: str = "binary", shape=None,
         dtype=np.float64) -> jnp.ndarray:
    """Reference ``Read``."""
    fmt = fmt.lower()
    if fmt == "ascii":
        return jnp.asarray(np.loadtxt(path))
    if fmt == "binary":
        with open(path, "rb") as f:
            hdr = np.frombuffer(f.read(16), np.int64)
            data = np.frombuffer(f.read(), dtype)
        return jnp.asarray(data.reshape(hdr))
    if fmt == "binary_flat":
        assert shape is not None
        with open(path, "rb") as f:
            data = np.frombuffer(f.read(), dtype)
        return jnp.asarray(data.reshape(shape))
    if fmt == "matrix_market":
        return jnp.asarray(read_matrix_market(path).to_dense())
    raise ValueError(f"unknown format {fmt!r}")


def display(A: Arr, title: str = "", save: Optional[str] = None):
    """Reference ``Display``: heatmap visualization (matplotlib)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        print_matrix(A, title)
        return None
    a = np.asarray(as_array(A))
    fig, ax = plt.subplots()
    im = ax.imshow(np.real(a), cmap="RdBu")
    ax.set_title(title)
    fig.colorbar(im)
    if save:
        fig.savefig(save)
        plt.close(fig)
    return fig


def spy(A, tol: float = 0.0, title: str = "",
        save: Optional[str] = None):
    """Reference ``Spy``: nonzero-pattern plot."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return None
    if isinstance(A, SparseMatrix):
        a = A.to_dense()
    else:
        a = np.asarray(as_array(A))
    fig, ax = plt.subplots()
    ax.spy(np.abs(a) > tol)
    ax.set_title(title)
    if save:
        fig.savefig(save)
        plt.close(fig)
    return fig


def color_map(values, cmap: str = "RdBu"):
    """Reference ``ColorMap``: scalar → RGBA."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.colors as colors
    v = np.asarray(values, float)
    norm = colors.Normalize(vmin=float(v.min()), vmax=float(v.max()))
    return cm.get_cmap(cmap)(norm(v))
