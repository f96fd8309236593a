"""CopyFile / DeleteFiles / CreateNewShapefile sidecar-closure parity
(FIleOperations/src/plugins/{CopyFile,DeleteFiles,CreateNewShapefile}.java)."""

import os

import numpy as np
import pandas as pd
import pytest

from whitebox_geospatial_analysis_tools_ray.sources import fileops


def _make_shapefile(path):
    from whitebox_geospatial_analysis_tools_ray.sources.shapefile_io import (
        write_shapefile)
    write_shapefile(path, [{"shape_type": 1,
                            "rings": [np.array([[1.0, 2.0]])]}],
                    attrs=pd.DataFrame({"v": [3.0]}))
    open(path[:-4] + ".prj", "w").write("GEOGCS[...]")


def test_copy_file_shp_sidecars(tmp_path):
    src = str(tmp_path / "a.shp")
    dst = str(tmp_path / "b.shp")
    _make_shapefile(src)
    written = fileops.copy_file(src, dst)
    assert sorted(os.path.basename(w) for w in written) == [
        "b.dbf", "b.prj", "b.shp", "b.shx"]
    for ext in (".shp", ".shx", ".dbf", ".prj"):
        assert (open(src[:-4] + ext, "rb").read()
                == open(dst[:-4] + ext, "rb").read())


def test_copy_file_dep_tas(tmp_path):
    dep, tas = str(tmp_path / "r.dep"), str(tmp_path / "r.tas")
    open(dep, "w").write("Rows:\t2\n")
    open(tas, "wb").write(b"\x01\x02\x03\x04")
    out = fileops.copy_file(dep, str(tmp_path / "s.dep"))
    assert sorted(os.path.basename(w) for w in out) == ["s.dep", "s.tas"]
    assert open(str(tmp_path / "s.tas"), "rb").read() == b"\x01\x02\x03\x04"


def test_copy_file_extension_mismatch(tmp_path):
    with pytest.raises(ValueError):
        fileops.copy_file(str(tmp_path / "a.shp"), str(tmp_path / "b.dep"))


def test_delete_files_closure(tmp_path):
    src = str(tmp_path / "a.shp")
    _make_shapefile(src)
    removed = fileops.delete_files(src)
    assert len(removed) == 4
    assert not any(os.path.exists(p) for p in removed)
    # missing files: no error, nothing removed
    assert fileops.delete_files(src) == []


def test_create_new_shapefile_readable(tmp_path):
    from whitebox_geospatial_analysis_tools_ray.sources.shapefile_io import (
        read_shapefile)
    for name, code in [("polygon", 5), ("pointz", 11), ("polylinem", 23)]:
        p = str(tmp_path / f"{name}.shp")
        fileops.create_new_shapefile(p, name)
        df = read_shapefile(p)
        assert len(df) == 0
        import struct
        hdr = open(p, "rb").read(100)
        assert struct.unpack_from("<i", hdr, 32)[0] == code
        assert os.path.exists(p[:-4] + ".shx")
        assert os.path.exists(p[:-4] + ".dbf")
    with pytest.raises((ValueError, KeyError)):
        fileops.create_new_shapefile(str(tmp_path / "x.shp"), "hexagon")
