"""Console entry points (cf. reference ``pisa/scripts`` + ``setup.py:322-345``)."""
