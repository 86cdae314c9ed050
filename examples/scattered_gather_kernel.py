"""Scattered-numbering topologies: the lane-routed gather kernel.

The banded DIA split (examples/device_scale_general.py) needs a
CONCENTRATED offset histogram; an imported mesh after RCM — or any
block-scrambled numbering — spreads its offsets across the whole band
and `plan_split_width` rejects it. On that class the XLA gather SpMV is
pinned to ~0.13 G gathered elem/s (locality-insensitive, measured); the
lane-routed pallas kernel (`ops/pallas_gather_spmv.LaneRoutedELL`)
composes the gather out of Mosaic lane-dim dynamic gathers instead.

Run on CPU (interpret-mode kernel):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/scattered_gather_kernel.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from fdapde_core_tpu.geometry.structured import irregular_mesh_device_soa
from fdapde_core_tpu.models.matfree import MatrixFreeElliptic

n = 96
x, y, c0, c1, c2, bnd = irregular_mesh_device_soa(n, 0.2, dtype=jnp.float64)
nd = (n + 1) ** 2

# scramble the dof numbering block-locally (a symmetric permutation —
# the operator class plan_split_width rejects: spread histogram)
S, G = 512, 397
GI = pow(G, -1, S)
nfull = (nd // S) * S
i = jnp.arange(nd, dtype=jnp.int32)
p = jnp.where(i < nfull, (i // S) * S + (G * (i % S)) % S, i)
pinv = jnp.where(i < nfull, (i // S) * S + (GI * (i % S)) % S, i)

nodes = (x[pinv], y[pinv])
cells = jnp.stack([p[c0], p[c1], p[c2]], axis=1)
boundary = bnd[pinv]

# gather_kernel="lane": the constructor detects that the banded upgrade
# fails and swaps the ELL SpMV for the lane-routed kernel
model = MatrixFreeElliptic(nodes, cells, boundary, K=1.0, c=0.3,
                           gather_kernel="lane")
print("preconditioner:", model.preconditioner)
assert model.preconditioner == "auxgrid+lane"

b = model.load_vector(jnp.ones(2 * n * n, jnp.float64))
u, iters, rel = model.solve(b, rtol=1e-10, maxiter=300)
print(f"solved {nd} dofs in {int(iters)} iterations, true rel res "
      f"{float(rel):.2e}")
assert float(rel) < 1e-9

# cross-check against the plain XLA gather path
ref = MatrixFreeElliptic(nodes, cells, boundary, K=1.0, c=0.3)
ur, itr, relr = ref.solve(b, rtol=1e-10, maxiter=300)
err = float(jnp.max(jnp.abs(u - ur)))
print(f"max |lane - xla| = {err:.2e}")
assert err < 1e-8
print("ok")

# aux_kernel="lane" additionally routes the aux-grid preconditioner's
# P/P^T interpolation stages through the lane kernel (round 5) — the
# converged refined solve was otherwise bound by those flat XLA
# gathers (~12.5x on the apply at 5M dofs, measured). For numberings
# with spatial locality (strip-quantile orders) it engages silently;
# band-misaligned ones (like this scramble) fall back to the XLA aux.
la_model = MatrixFreeElliptic(nodes, cells, boundary, K=1.0, c=0.3,
                              gather_kernel="lane", aux_kernel="lane")
ul, itl, rell = la_model.solve(b, rtol=1e-10, maxiter=300)
assert float(rell) < 1e-9
print("aux_kernel='lane' ok:", float(jnp.max(jnp.abs(ul - ur))) < 1e-8)
