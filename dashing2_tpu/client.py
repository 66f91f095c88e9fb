"""Zero-import daemon client: dispatch a CLI job to a resident
`dashing2-tpu serve` worker WITHOUT importing jax (the package import
costs ~3.5 s; the whole point of the daemon is a warm-wall job).

Run as a plain script (direct file execution skips the package
__init__ and its jax import):

    dashing2-tpu serve --socket /tmp/d2.sock \
        --warm "cmp --warm-only 10240 -S 1024 --fastcmp 0.5 --bbit-sigs" &
    DASHING2_TPU_DAEMON=/tmp/d2.sock \
        python /path/to/dashing2_tpu/client.py sketch ... -F list.txt

The socket protocol lives in serve.py (stdlib-only at module level);
it is loaded here by file path so the package __init__ never runs.
"""

import importlib.util
import os
import sys


def _load_serve_module():
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "_d2_serve_standalone", os.path.join(here, "serve.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    path = os.environ.get("DASHING2_TPU_DAEMON")
    if not path:
        print("dashing2_tpu.client: set DASHING2_TPU_DAEMON to the "
              "worker socket path", file=sys.stderr)
        return 2
    serve = _load_serve_module()
    try:
        return serve.client_run(path, argv)
    except OSError as e:
        print(f"dashing2_tpu.client: worker at {path} unreachable "
              f"({e})", file=sys.stderr)
        return 111


if __name__ == "__main__":
    sys.exit(main())
