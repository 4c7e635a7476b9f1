"""Golden physics regression test (SURVEY.md §4): a deterministic
miniature trajectory pair with pinned TKE / moment values. Any change
to the synthetic generator, normalization, or statistics pipeline that
shifts the physics silently will trip these tolerances."""

import numpy as np
import jax.numpy as jnp

from tpuflow.data import generate_case
from tpuflow.eval.stats import tke_field, velocity_moments

# Pinned on 2026-08-16 from generate_case("backward-step", 2, 16,
# (32, 64), (8, 16), seed=1234) — regenerate deliberately if the
# generator's physics changes, and say so in the commit message.
GOLDEN = {
    "tke_mean": 0.00598483,
    "tke_max": 0.01970290,
    "u_mean": 0.82413352,
    "u_var": 0.00345987,
    "v_kurt": 2.035147,
}


def test_golden_physics_values():
    # fixture_version pinned EXPLICITLY: the config default moved to
    # v2 (the honest fixture); these goldens freeze the v1 generator.
    lf, hf = generate_case(
        "backward-step", 2, 16, (32, 64), (8, 16), seed=1234,
        fixture_version=1,
    )
    tke = np.asarray(tke_field(jnp.asarray(hf.var(axis=1))))
    m = velocity_moments(jnp.asarray(hf[0]), axes=(0,))

    np.testing.assert_allclose(tke.mean(), GOLDEN["tke_mean"], rtol=1e-4)
    np.testing.assert_allclose(tke.max(), GOLDEN["tke_max"], rtol=1e-4)
    np.testing.assert_allclose(
        float(m["mean"][..., 0].mean()), GOLDEN["u_mean"], rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m["var"][..., 0].mean()), GOLDEN["u_var"], rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m["kurt"][..., 1].mean()), GOLDEN["v_kurt"], rtol=1e-3
    )
    # All moments finite everywhere, including masked solid regions
    # (regression: std**4 underflow produced NaN kurtosis there).
    for v in m.values():
        assert np.all(np.isfinite(np.asarray(v)))
