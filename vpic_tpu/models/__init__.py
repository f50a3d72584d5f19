"""Built-in decks (analogues of the reference's sample/ decks)."""

from . import (asymm4sp, beam_plas, dipole, emission, harris, lpi,
               reconnection, shapes, twostream, waveguide,
               weibel)  # noqa: F401
