"""Test shim: the synthetic dataset generator now lives in the package
(ultralytics_pro_tpu/data/synth.py) so bundled dataset YAMLs can generate at
first use; tests import it from here for backwards compatibility."""

from ultralytics_pro_tpu.data.synth import make_synth_dataset  # noqa: F401

if __name__ == "__main__":
    import sys

    print(make_synth_dataset(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth8"))
