"""Build the --py-files zip of the engine package for spark-submit."""
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine.zip"
    pkg = os.path.join(REPO, "engine")
    with zipfile.ZipFile(out, "w") as z:
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)

if __name__ == "__main__":
    main()
