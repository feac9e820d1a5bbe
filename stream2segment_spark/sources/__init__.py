"""Data sources: FDSN text, miniSEED records, HTTP fetch UDFs."""
