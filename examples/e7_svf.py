"""SVF matching (reference examples/e7_svf.py): two scenarios.

* ``svf`` — reference ``example_svf`` (e7_svf.py:16-124): train a MIMO
  cascade of state-variable filters (free mixing coefficients,
  ``filter_type=None``) to match a random SVF-cascade target magnitude.
* ``parallel_svf`` — reference ``example_parallel_svf`` (:126-234): the
  diagonal variant.

Plus the original shelving demo (``lowshelf``): a typed SVF trained to a
closed-form lowshelf target.
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, setup, train_filter_to_target


def _random_svf_target(args, key, shape):
    """Random SVF cascade response, prod over sections
    (reference e7_svf.py:27-37): fc ~ U(0, fs/2), R ~ U(0, 1), free
    mixing coefficients m ~ U(-1, 1)."""
    from flamo_tpu.functional import svf

    k1, k2, k3 = jax.random.split(key, 3)
    fc = args.samplerate / 2 * jax.random.uniform(k1, shape)
    R = jax.random.uniform(k2, shape) + 0.2  # damped: keep |poles| < 1
    m = jax.random.uniform(k3, shape + (3,), minval=-1.0, maxval=1.0)
    b, a = svf(fc, R, m=m, filter_type=None, fs=args.samplerate)
    B = np.fft.rfft(np.asarray(b), args.nfft, axis=0)
    A = np.fft.rfft(np.asarray(a), args.nfft, axis=0)
    return jnp.asarray(np.prod(B, axis=1) / np.prod(A, axis=1))


def _impulse_target(args, target_filter, in_ch, mimo):
    from flamo_tpu.functional import signal_gallery

    x = signal_gallery(1, n_samples=args.nfft, n=in_ch,
                       signal_type="impulse", fs=args.samplerate)
    X = jnp.fft.rfft(x, args.nfft, axis=1)
    if mimo:
        return jnp.abs(jnp.einsum("...ji,...i->...j", target_filter, X))
    return jnp.abs(jnp.einsum("...i,...i->...i", target_filter, X))


def example_svf(args):
    from flamo_tpu.processor import dsp

    in_ch, out_ch = 1, 2
    n_sections = 4
    target_filter = _random_svf_target(
        args, jax.random.PRNGKey(args.seed), (n_sections, out_ch, in_ch))
    target_mag = _impulse_target(args, target_filter, in_ch, mimo=True)

    filt = dsp.SVF(size=(out_ch, in_ch), n_sections=n_sections,
                   filter_type=None, nfft=args.nfft, fs=args.samplerate,
                   requires_grad=True, alias_decay_db=0)
    train_filter_to_target(args, filt, target_mag, in_ch, tag="svf")


def example_parallel_svf(args):
    from flamo_tpu.processor import dsp

    ch = 2
    n_sections = 4
    target_filter = _random_svf_target(
        args, jax.random.PRNGKey(args.seed + 1), (n_sections, ch))
    target_mag = _impulse_target(args, target_filter, ch, mimo=False)

    filt = dsp.parallelSVF(size=(ch,), n_sections=n_sections,
                           filter_type=None, nfft=args.nfft,
                           fs=args.samplerate, requires_grad=True,
                           alias_decay_db=0)
    train_filter_to_target(args, filt, target_mag, ch, tag="parallel_svf")


def example_lowshelf(args):
    """Typed SVF trained to a closed-form lowshelf target."""
    from flamo_tpu.processor import dsp
    from flamo_tpu.functional import svf, biquad2tf

    b, a = svf(jnp.asarray(800.0), jnp.asarray(1.0),
               G=jnp.asarray(10 ** (-6 / 20)), filter_type="lowshelf",
               fs=args.samplerate)
    target_mag = jnp.abs(biquad2tf(b, a, args.nfft))[None, :, None]

    filt = dsp.SVF(size=(1, 1), n_sections=2, filter_type="lowshelf",
                   nfft=args.nfft, fs=args.samplerate, requires_grad=True)
    train_filter_to_target(args, filt, target_mag, 1, tag="lowshelf")


def main(args):
    scenarios = {
        "svf": example_svf,
        "parallel_svf": example_parallel_svf,
        "lowshelf": example_lowshelf,
    }
    names = list(scenarios) if args.scenario == "all" else [args.scenario]
    for name in names:
        print(f"--- e7_svf scenario: {name} ---")
        scenarios[name](args)


if __name__ == "__main__":
    ap = example_parser(nfft=4096, max_epochs=5, lr=5e-2, num=16,
                        batch_size=2)
    ap.add_argument("--scenario", type=str, default="all",
                    choices=["svf", "parallel_svf", "lowshelf", "all"])
    args = setup(ap.parse_args())
    main(args)
