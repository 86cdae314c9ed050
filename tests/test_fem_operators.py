"""Golden weak-form integrals for a single element.

Mirrors /root/reference/test/src/fem_operators_test.cpp:40-104: the 36 local
P2 stiffness entries (-laplacian weak form) of cell 175 of the c_shaped mesh.
"""

import numpy as np

from fdapde_core_tpu.fem import FEMSpace, assemble_matrix
from fdapde_core_tpu.fem.assembler import local_matrices
import fdapde_core_tpu as fdm

from tests.conftest import load_mesh

EXPECTED = np.array(
    [
        [0.7043890316492852, 0.1653830261033185, 0.0694133177797771,
         -0.6615321044132733, -0.2776532711191089, 0.0000000000000013],
        [0.1653830261033185, 0.7043890316492852, 0.0694133177797769,
         -0.6615321044132735, 0.0000000000000003, -0.2776532711191076],
        [0.0694133177797771, 0.0694133177797769, 0.4164799066786617,
         0.0000000000000002, -0.2776532711191083, -0.2776532711191075],
        [-0.6615321044132733, -0.6615321044132735, 0.0000000000000002,
         2.4336772933029756, -0.5553065422382126, -0.5553065422382162],
        [-0.2776532711191089, 0.0000000000000003, -0.2776532711191083,
         -0.5553065422382126, 2.4336772933029738, -1.3230642088265447],
        [0.0000000000000013, -0.2776532711191075, -0.2776532711191076,
         -0.5553065422382162, -1.3230642088265447, 2.4336772933029751],
    ]
)


def test_laplacian_order2_element_integrals():
    mesh = load_mesh("c_shaped")
    space = FEMSpace(mesh, 2)
    import jax.numpy as jnp
    from fdapde_core_tpu.geometry.affine import affine_maps

    _, invJ, measure = affine_maps(
        jnp.asarray(mesh.nodes), jnp.asarray(mesh.cells)
    )
    local = local_matrices(
        "laplacian",
        None,
        False,
        jnp.asarray(space.phi_tab),
        jnp.asarray(space.grad_tab),
        jnp.asarray(space.quad.weights),
        invJ,
        measure,
    )
    # L = -laplacian -> negate the weak form
    got = -np.asarray(local[175])
    assert np.abs(got - EXPECTED).max() < 50 * np.finfo(np.float64).eps
