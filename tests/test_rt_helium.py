"""SPHM1RT H+He thermochemistry network (rt_cooling_rates.h analog)."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.rt.helium import (HeliumNetwork,
                                             he_init_state,
                                             he_thermochemistry)


def _state(n=16, rho=1.0, G=1):
    C, K = 1, n
    live = jnp.ones((C, K), jnp.float32)
    return {
        "mask": live,
        "rho": jnp.full((C, K), rho, jnp.float32),
        "rt_E": jnp.zeros((C, K, G), jnp.float32),
        "rt_F": jnp.zeros((C, K, G, 3), jnp.float32),
        "u": jnp.ones((C, K), jnp.float32),
        "u_full": jnp.ones((C, K), jnp.float32),
    }


def test_species_conservation_and_bounds():
    net = HeliumNetwork(sigma_HI=(2.0,), sigma_HeI=(1.0,),
                        sigma_HeII=(0.3,), e_photon=(2.0,),
                        alpha_HII=0.5, alpha_HeII=0.6, alpha_HeIII=1.5,
                        beta_HI=0.1, beta_HeI=0.05, beta_HeII=0.02,
                        chem_substeps=8)
    s = he_init_state(_state(), net)
    s = {**s, "rt_E": jnp.full_like(s["rt_E"], 3.0)}
    for _ in range(20):
        s = he_thermochemistry(s, net, 0.3)
        yI = np.asarray(s["y_HeI"])
        yII = np.asarray(s["y_HeII"])
        x = np.asarray(s["x_HI"])
        assert ((yI >= 0) & (yI <= 1)).all()
        assert ((yII >= 0) & (yII <= 1)).all()
        assert (yI + yII <= 1.0 + 1e-6).all()
        assert ((x >= 0) & (x <= 1)).all()
        assert np.isfinite(np.asarray(s["rt_E"])).all()


def test_collisional_equilibrium_matches_analytic():
    """No photons: each pair settles to beta/(alpha+beta) of the pair
    being ionized — the n_e factor cancels from both sides."""
    net = HeliumNetwork(sigma_HI=(0.0,), sigma_HeI=(0.0,),
                        sigma_HeII=(0.0,), e_photon=(1.0,),
                        alpha_HII=0.7, alpha_HeII=0.9, alpha_HeIII=1.3,
                        beta_HI=0.3, beta_HeI=0.2, beta_HeII=0.1,
                        chem_substeps=4)
    s = he_init_state(_state(rho=5.0), net)
    # start half-ionized so n_e > 0 (pure-neutral is a fixed point of
    # the collisional-only network)
    s = {**s, "x_HI": 0.5 * s["x_HI"], "y_HeI": 0.5 * s["y_HeI"],
         "y_HeII": jnp.full_like(s["y_HeII"], 0.3)}
    for _ in range(400):
        s = he_thermochemistry(s, net, 0.5)
    x = float(np.asarray(s["x_HI"])[0, 0])
    yI = float(np.asarray(s["y_HeI"])[0, 0])
    yII = float(np.asarray(s["y_HeII"])[0, 0])
    yIII = 1.0 - yI - yII
    np.testing.assert_allclose(x, 0.7 / (0.7 + 0.3), rtol=1e-3)
    # pair ratios: yI/yII = alpha_HeII/beta_HeI, yII/yIII = a3/b2
    np.testing.assert_allclose(yI / yII, 0.9 / 0.2, rtol=2e-3)
    np.testing.assert_allclose(yII / yIII, 1.3 / 0.1, rtol=2e-3)


def test_pure_hydrogen_limit_matches_gear_network():
    """Y_He = 0 with no absorption cap active: the H channel must agree
    with gear.rt_thermochemistry (same integrator)."""
    from swift_subtask_dev_tpu.rt.gear import RTParams, rt_thermochemistry

    sig, eg = 1.7, 3.0
    aB, bc = 0.4, 0.12
    he = HeliumNetwork(Y_He=0.0, X_H=1.0, sigma_HI=(sig,),
                       sigma_HeI=(0.0,), sigma_HeII=(0.0,),
                       e_photon=(eg,), alpha_HII=aB, beta_HI=bc,
                       chem_substeps=4, c_red=1.0)
    gp = RTParams(sigma=(sig,), e_photon=(eg,), alpha_B=aB,
                  beta_coll=bc, X_H=1.0, c_red=1.0, chem_substeps=4)

    s0 = _state(rho=2.0)
    # weak field so the gear photon-conservation cap never binds
    s0 = {**s0, "rt_E": jnp.full_like(s0["rt_E"], 1e-3)}
    sh = he_init_state(dict(s0), he)
    sg = {**s0, "x_HI": jnp.ones_like(s0["mask"])}

    for _ in range(10):
        sh = he_thermochemistry(sh, he, 0.2)
        sg = rt_thermochemistry(sg, gp, 0.2)
    np.testing.assert_allclose(np.asarray(sh["x_HI"]),
                               np.asarray(sg["x_HI"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sh["rt_E"]),
                               np.asarray(sg["rt_E"]), rtol=1e-5)


def test_photoheating_thresholds():
    """Heating deposits (1 - e_ion/e_gamma) of the absorbed energy per
    species: a group below the HeII threshold heats only via HI/HeI."""
    net = HeliumNetwork(sigma_HI=(1.0,), sigma_HeI=(0.0,),
                        sigma_HeII=(0.0,), e_photon=(2.0,),
                        e_ion_HI=1.0, heating=True, chem_substeps=2)
    s = he_init_state(_state(rho=1.0), net)
    E0 = 0.5
    s = {**s, "rt_E": jnp.full_like(s["rt_E"], E0)}
    u0 = float(s["u"][0, 0])
    s = he_thermochemistry(s, net, 0.1)
    dE = E0 - float(np.asarray(s["rt_E"])[0, 0, 0])
    du = float(np.asarray(s["u"])[0, 0]) - u0
    # half the photon energy is above threshold
    np.testing.assert_allclose(du, dE * (1.0 - 1.0 / 2.0), rtol=1e-4)
