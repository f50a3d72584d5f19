"""Built-in decks (analogues of the reference's sample/ decks)."""

from . import beam_plas, harris, lpi, reconnection, weibel  # noqa: F401
