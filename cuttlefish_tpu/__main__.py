"""`python -m cuttlefish_tpu` = the cuttlefish CLI."""

from cuttlefish_tpu.cli import main

main()
