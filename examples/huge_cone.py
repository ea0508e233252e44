"""One HUGE second-order cone sharded across the device mesh.

The solver analog of long-context/sequence parallelism (SURVEY.md sec. 5):
a single robust-fitting constraint ||B x - d|| <= a'x + b whose residual
vector is far too long for one device's comfort.  The cone vector (and the
rows of G) shard across the mesh; every Jordan-algebra operation is local
elementwise work plus one psum, and the KKT condenses to a psum-reduced
tall-skinny Gram.

Run on the faked 8-device mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/huge_cone.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from socp_tpu.parallel.hugecone import solve_huge_soc
from socp_tpu.parallel.mesh import block_mesh

ndev = len(jax.devices())
rng = np.random.default_rng(0)

n = 16            # few variables...
q = 8 * 1024 + 1  # ...one enormous SOC (scale this with the mesh)
l = 8             # plus a small orthant box

# min c'x  s.t.  ||B x - d|| <= a'x + 5,  |x_i| <= 2 (first l/2 coords)
G = np.zeros((l + q, n))
h = np.zeros(l + q)
for i in range(l // 2):
    G[2 * i, i], G[2 * i + 1, i] = 1.0, -1.0
    h[2 * i] = h[2 * i + 1] = 2.0
a = rng.normal(size=n) * 0.1
B = rng.normal(size=(q - 1, n)) / np.sqrt(n)
d = rng.normal(size=q - 1) * 0.1
G[l] = -a
h[l] = 5.0
G[l + 1:] = -B
h[l + 1:] = -d
c = rng.normal(size=n)

mesh = block_mesh(ndev)
x, s, z, status, iters, stats = solve_huge_soc(c, G, h, l, mesh=mesh)
pcost, gap, pres, dres = stats
print(f"devices={ndev}  q={q:,}  status={status.name}  iters={iters}")
print(f"pcost={pcost:.6f}  gap={gap:.2e}  pres={pres:.2e}  dres={dres:.2e}")
resid = np.linalg.norm(B @ x - d)
print(f"||Bx-d|| = {resid:.4f}  <=  a'x+5 = {a @ x + 5:.4f}")
