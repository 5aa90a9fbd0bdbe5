"""Build the native runtime: python -m soundscope_tpu.native.build"""

from soundscope_tpu.native import build

if __name__ == "__main__":
    print(build(force=True))
