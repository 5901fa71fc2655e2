"""Typed errors (mirror of the reference's exception taxonomy,
``gridfia/exceptions.py:58-99``)."""


class GridFIARayError(Exception):
    """Base error."""


class InvalidTileTable(GridFIARayError):
    """Tile table fails schema or alignment validation
    (analog of InvalidZarrStructure)."""


class CalculationFailed(GridFIARayError):
    """Unknown kernel name or kernel config rejected
    (analog of the reference's CalculationFailed, api.py:470-477)."""


class SpeciesNotFound(GridFIARayError):
    """Requested species code absent from the catalog
    (analog of zarr_utils.py:494-528 typed miss)."""
