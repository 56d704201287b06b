"""Shipped test-support harnesses (cf. the reference's ``pisa_tests``
package, which is installed with console entry points)."""
