"""Native C++ kernels vs the numpy oracle (fem/taylor_hood.py).

The C++ library is the production host substrate (DOLFIN/FFC parity,
SURVEY.md SS2 row 9); these tests pin it bit-for-bit (same quadrature,
f64) against the vectorized numpy assembly.
"""
import numpy as np
import pytest

from optconpy_tpu import native
from optconpy_tpu.fem.mesh2d import unit_square_mesh
from optconpy_tpu.fem.taylor_hood import TaylorHoodSpace, assemble_stokes

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def setup():
    mesh = unit_square_mesh(7)
    space = TaylorHoodSpace.build(mesh)
    ops = assemble_stokes(space, nu=1.0)
    return mesh, space, ops


def test_element_matrices_match_numpy(setup):
    mesh, space, ops = setup
    m_loc, k_loc, j_loc, area = native.element_matrices(
        mesh.vertices, mesh.triangles
    )
    np.testing.assert_allclose(area, space.area, rtol=1e-14)
    # Accumulate native blocks and compare assembled operators.
    import scipy.sparse as sp

    nt = mesh.nt
    ns = space.n_scalar
    dofs = space.tri_dofs
    rows = np.broadcast_to(dofs[:, :, None], (nt, 6, 6)).ravel()
    cols = np.broadcast_to(dofs[:, None, :], (nt, 6, 6)).ravel()
    ms = sp.coo_matrix((m_loc.ravel(), (rows, cols)), shape=(ns, ns)).tocsr()
    ks = sp.coo_matrix((k_loc.ravel(), (rows, cols)), shape=(ns, ns)).tocsr()
    np.testing.assert_allclose(
        ms.toarray(), ops["Ms"].toarray(), atol=1e-13
    )
    np.testing.assert_allclose(
        ks.toarray(), ops["Ks"].toarray(), atol=1e-12
    )
    # Divergence blocks -> assembled J.
    prow = np.broadcast_to(mesh.triangles[:, :, None], (nt, 3, 6)).ravel()
    jcol = np.broadcast_to(dofs[:, None, :], (nt, 3, 6)).ravel()
    j_x = sp.coo_matrix(
        (j_loc[:, :, :, 0].ravel(), (prow, jcol)), shape=(mesh.nv, 2 * ns)
    )
    j_y = sp.coo_matrix(
        (j_loc[:, :, :, 1].ravel(), (prow, jcol + ns)),
        shape=(mesh.nv, 2 * ns),
    )
    np.testing.assert_allclose(
        (j_x + j_y).toarray(), ops["J"].toarray(), atol=1e-13
    )


def test_convection_apply_matches_numpy(setup):
    mesh, space, ops = setup
    from optconpy_tpu.fem.taylor_hood import convection_tensor

    ns = space.n_scalar
    rng = np.random.default_rng(0)
    v = rng.standard_normal(2 * ns)
    y_native = native.convection_apply(
        mesh.vertices, mesh.triangles, space.tri_dofs, ns, v
    )
    t0 = convection_tensor(ops)
    v2 = v.reshape(2, ns)
    v_loc = v2[:, space.tri_dofs].transpose(1, 2, 0)
    out_loc = np.einsum("eijkb,ejb,eka->eia", t0, v_loc, v_loc)
    y_ref = np.zeros((2, ns))
    np.add.at(y_ref[0], space.tri_dofs.ravel(), out_loc[:, :, 0].ravel())
    np.add.at(y_ref[1], space.tri_dofs.ravel(), out_loc[:, :, 1].ravel())
    np.testing.assert_allclose(y_native, y_ref.ravel(), atol=1e-12)


def test_csr_to_ell_matches_python(setup):
    _, _, ops = setup
    from optconpy_tpu.ops.sparse import ell_from_scipy

    a = ops["Ms"]
    ell = ell_from_scipy(a, pad_to=4)
    data, cols = native.csr_to_ell_arrays(a, ell.row_nnz)
    np.testing.assert_array_equal(data, np.asarray(ell.data))
    np.testing.assert_array_equal(cols, np.asarray(ell.cols))
