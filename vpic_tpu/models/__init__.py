"""Built-in decks (analogues of the reference's sample/ decks)."""

from . import harris, weibel  # noqa: F401
