"""Placeholder — implemented later this round."""


class PirDatabase:  # pragma: no cover - placeholder
    pass
