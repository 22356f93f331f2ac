"""Hello world: mesh + describe (reference example 01)."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import l3ster_tpu as lt

mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 11)), order=3)
print(mesh.describe())
print(f"devices available: {jax.devices()}")
