from flamo_tpu.ops.solve import gauss_solve, closed_loop_solve

_PALLAS_EXPORTS = ("pallas_fdn_solve", "pallas_fdn_tf", "pallas_fdn_tf_mse",
                   "pallas_fdn_sos_tf_mse", "pallas_aa_tf_mse",
                   "pallas_aa_taps_tf_mse",
                   "pallas_gauss_solve", "pallas_sos_cascade")
_PALLAS_EIG_EXPORTS = ("pallas_dk_roots",)


def __getattr__(name):
    # lazy: importing the Pallas kernels pulls in jax.experimental.pallas
    # (+ Mosaic); defer it so `import flamo_tpu` stays light and a broken
    # pallas import only breaks the pallas code paths
    if name in _PALLAS_EXPORTS:
        from flamo_tpu.ops import pallas_solve

        return getattr(pallas_solve, name)
    if name in _PALLAS_EIG_EXPORTS:
        from flamo_tpu.ops import pallas_eig

        return getattr(pallas_eig, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_PALLAS_EXPORTS)
                  + list(_PALLAS_EIG_EXPORTS))
