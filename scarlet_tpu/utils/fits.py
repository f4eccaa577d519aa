"""Minimal FITS image reader (primary HDU), self-contained.

astropy is optional in the runtime; this reads simple image FITS files
(2880-byte header blocks of 80-char cards, big-endian data) and extracts
the WCS keywords into a :class:`~scarlet_tpu.utils.wcs.AffineWCS`.
"""
from __future__ import annotations

import numpy as np

from .wcs import AffineWCS

__all__ = ["read_fits"]

_BITPIX_DTYPE = {
    8: np.uint8,
    16: ">i2",
    32: ">i4",
    64: ">i8",
    -32: ">f4",
    -64: ">f8",
}


def _parse_card(card):
    key = card[:8].strip()
    if "=" not in card or not key or key in ("COMMENT", "HISTORY"):
        return key, None
    value = card[10:].split("/")[0].strip()
    if value.startswith("'"):
        return key, value.strip("'").strip()
    if value in ("T", "F"):
        return key, value == "T"
    try:
        if any(c in value for c in ".eED") and not value.lstrip("+-").isdigit():
            return key, float(value.replace("D", "E"))
        return key, int(value)
    except ValueError:
        return key, value


def read_fits(path, hdu=0):
    """Read an image HDU: returns (data, header dict, wcs or None)."""
    with open(path, "rb") as f:
        raw = f.read()

    offset = 0
    for h in range(hdu + 1):
        header = {}
        end = False
        while not end:
            block = raw[offset:offset + 2880].decode("ascii", errors="replace")
            offset += 2880
            for i in range(0, 2880, 80):
                card = block[i:i + 80]
                if card.startswith("END"):
                    end = True
                    break
                key, val = _parse_card(card)
                if val is not None:
                    header[key] = val

        naxis = header.get("NAXIS", 0)
        shape = tuple(
            int(header[f"NAXIS{i}"]) for i in range(naxis, 0, -1)
        )
        bitpix = header.get("BITPIX", -32)
        nbytes = int(np.prod(shape)) * abs(bitpix) // 8 if shape else 0
        if h == hdu:
            data = np.frombuffer(
                raw[offset:offset + nbytes], dtype=_BITPIX_DTYPE[bitpix]
            ).reshape(shape).astype(np.float64)
            bscale = header.get("BSCALE", 1.0)
            bzero = header.get("BZERO", 0.0)
            if bscale != 1.0 or bzero != 0.0:
                data = data * bscale + bzero
            break
        # skip data (padded to 2880)
        offset += (nbytes + 2879) // 2880 * 2880

    wcs = None
    if "CRPIX1" in header:
        crpix = np.array([header["CRPIX1"], header["CRPIX2"]], float)
        crval = np.array([header.get("CRVAL1", 0.0),
                          header.get("CRVAL2", 0.0)], float)
        if "CD1_1" in header:
            cd = np.array([
                [header["CD1_1"], header.get("CD1_2", 0.0)],
                [header.get("CD2_1", 0.0), header["CD2_2"]],
            ])
            cdelt = np.ones(2)
            pc = cd
        else:
            cdelt = np.array([header.get("CDELT1", 1.0),
                              header.get("CDELT2", 1.0)])
            pc = np.array([
                [header.get("PC1_1", 1.0), header.get("PC1_2", 0.0)],
                [header.get("PC2_1", 0.0), header.get("PC2_2", 1.0)],
            ])
        ctype = (header.get("CTYPE1", "RA---TAN"),
                 header.get("CTYPE2", "DEC--TAN"))
        wcs = AffineWCS(crpix=crpix, crval=crval, pc=pc, cdelt=cdelt,
                        ctype=ctype, array_shape=shape[-2:] if shape else None)
    return data, header, wcs
