"""Build the compiled-reference differential driver.

The reference checkout (read-only, MSVC-targeted) is staged into a temp
build directory where two mechanical ISO-conformance fixes are applied —
misplaced ``inline [[nodiscard]]`` attribute order and g++'s stricter
name-lookup for ``region::dimensions`` (handled via ``-fpermissive``) —
then ``ref_driver.cpp`` is compiled against the staged headers.  Nothing
from the reference enters the repository; the staging dir lives under the
pytest tmp root and is deleted with it.

Skip policy: tests using the driver skip when the reference checkout or a
C++20 compiler is unavailable (e.g. the packaged framework on a user
machine) — this harness exists to cross-check the NumPy spec, not to ship.
"""

from __future__ import annotations

import pathlib
import re
import shutil
import subprocess
import tempfile

REF_SRC = pathlib.Path("/root/reference/src")
DRIVER = pathlib.Path(__file__).with_name("ref_driver.cpp")

_PATCHES = [
    # MSVC accepts attributes between decl-specifiers; ISO places them first
    (re.compile(r"inline \[\[nodiscard\]\]"), "[[nodiscard]] inline"),
]


def build_driver() -> pathlib.Path:
    """Compile the driver, returning the binary path; raises on failure."""
    if not REF_SRC.is_dir():
        raise FileNotFoundError(REF_SRC)
    stage = pathlib.Path(tempfile.mkdtemp(prefix="remap_ref_stage_"))
    for hpp in REF_SRC.glob("*.hpp"):
        text = hpp.read_text()
        for pat, repl in _PATCHES:
            text = pat.sub(repl, text)
        (stage / hpp.name).write_text(text)

    out = stage / "ref_driver"
    cmd = [
        "g++", "-std=c++20", "-O2", "-fpermissive",
        "-include", "functional", "-include", "cstring",
        "-include", "limits",
        "-I", str(stage),
        str(DRIVER), "-o", str(out),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out


def run_driver(binary, args, payload: bytes) -> bytes:
    proc = subprocess.run(
        [str(binary), *[str(a) for a in args]],
        input=payload,
        stdout=subprocess.PIPE,
        check=True,
    )
    return proc.stdout


def main() -> None:
    path = build_driver()
    print(path)


if __name__ == "__main__":
    main()
