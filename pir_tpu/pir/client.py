"""Placeholder — implemented later this round."""


class PirClient:  # pragma: no cover - placeholder
    pass
