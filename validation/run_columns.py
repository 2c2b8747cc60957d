"""Column-physics validation runs (CPU, float64). Writes results to stdout."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import climaseaice_jl_tpu as csi

day = 86400.0

# 1. freezing bucket: 10 days
import freezing_bucket
t, h, a = freezing_bucket.main()

# 2. melting in spring: 30 days, bare + snow
import melting_in_spring
melting_in_spring.main()

# 3. arctic basin seasonal cycle: 30 years
import arctic_basin_seasonal_cycle
arctic_basin_seasonal_cycle.main(years=30.0)

# 4. diffusive ice column: 10 days
import diffusive_ice_column_model
diffusive_ice_column_model.main()

# 5. coupled ice-ocean: 2 years
import ice_ocean_coupled
ice_ocean_coupled.main(years=2.0)

# 6. perpetual night: 40 days
import perpetual_night
perpetual_night.main()
