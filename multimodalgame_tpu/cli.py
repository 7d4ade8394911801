"""CLI entry point — ``python -m multimodalgame_tpu <flags>``.

Drop-in replacement for the reference's ``python model.py <flags>``
(model.py:1813-1820): same flag names and syntaxes, same preset dispatch,
same derived paths, same ``eval_only`` / ``binary_only`` alternate modes.
"""

from __future__ import annotations

import sys

from multimodalgame_tpu.config import flags_from_argv


def main(argv=None) -> None:
    flags = flags_from_argv(argv)
    from multimodalgame_tpu.train import run
    run(flags)


if __name__ == "__main__":
    main(sys.argv[1:])
