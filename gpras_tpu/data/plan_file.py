"""HEC-RAS plan (.pXX) files and plan-HDF editing.

Capability parity with the reference's plan layer (gpras/ras/plan.py:14-124):
typed boundary-condition dataclasses carrying their HDF target path, HDF
attribute/data patching (with the bytes-attribute quirk), and a key=value plan
file generated from a defaults template with per-run overrides (the reference
ships a 217-line captured template, gpras/ras/static/plan_template.txt; we
synthesize a default set programmatically and accept a user template path for
site-specific captures).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import h5py
import numpy as np


@dataclass
class EventCondition:
    """Generic event condition (HDF dataset payload + target path)."""

    data: np.ndarray

    @property
    def path(self) -> str:
        return "Event Conditions"


@dataclass
class FlowHydrographBC(EventCondition):
    """Unsteady flow hydrograph for one BC line
    (reference gpras/ras/plan.py:27-36)."""

    idx: str = ""
    timesteps: np.ndarray | None = None

    @property
    def path(self) -> str:
        return ("/Event Conditions/Unsteady/Boundary Conditions/"
                f"Flow Hydrographs/{self.idx}")


@dataclass
class PrecipitationBC(EventCondition):
    @property
    def path(self) -> str:
        return "/Event Conditions/Meteorology/Precipitation/Values"


@dataclass
class TemperatureBC(EventCondition):
    @property
    def path(self) -> str:
        return "/Event Conditions/Meteorology/Temperature/Values"


def update_hdf_attributes(hdf_path: str, attr_path: str, attrs: dict) -> None:
    """Patch HDF attributes; strings are written as fixed bytes, the only
    encoding HEC-RAS reads back reliably (reference gpras/ras/plan.py:62-72)."""
    with h5py.File(hdf_path, "r+") as f:
        node = f[attr_path].attrs
        for k, v in attrs.items():
            if isinstance(v, str):
                node[k] = np.bytes_(v.encode())
            else:
                node[k] = v


def update_hdf_data(hdf_path: str, data_path: str, data: np.ndarray) -> None:
    """Replace a dataset wholesale (delete + recreate, since shapes may change;
    reference gpras/ras/plan.py:75-81)."""
    with h5py.File(hdf_path, "a") as f:
        if data_path in f:
            del f[data_path]
        f.create_dataset(data_path, data=data)


def default_plan_settings() -> dict[str, str]:
    """A functional default key=value set for a 2D unsteady plan. Site-specific
    captures can be supplied via ``PlanFile(template_path=...)``."""
    return {
        "Plan Title": "",
        "Program Version": "6.60",
        "Short Identifier": "",
        "Simulation Date": "",
        "Geom File": "g01",
        "Flow File": "u01",
        "Friction Slope Method": "2",
        "Computation Interval": "10SEC",
        "Output Interval": "1HOUR",
        "Mapping Interval": "1HOUR",
        "Instantaneous Interval": "1HOUR",
        "Run HTab": "1",
        "Run UNet": "1",
        "Run Sediment": "0",
        "Run PostProcess": "1",
        "Run WQNet": "0",
        "Run RASMapper": "-1",
        "UNET Use Existing IB Tables": "-1",
        "UNET 1D Methodology": "Finite Difference",
        "UNET D2 SolverType": "Pardiso",
        "UNET D2 Name": "",
        "UNET D2 Theta": "1",
        "UNET D2 Theta Warmup": "1",
        "UNET D2 Tolerance": "0.003",
        "UNET D2 VTolerance": "0.003",
        "UNET D2 Iterations": "20",
        "UNET D2 WarmupIterations": "0",
        "UNET D2 Equation": "2",
        "UNET D1 Cores": "0",
        "UNET D2 Cores": "0",
        "PS Cores": "0",
        "UNET Max Iterations": "20",
        "UNET ZSA Tolerance": "0.01",
        "UNET ZFS Tolerance": "0.01",
        "UNET Flow Tolerance": "0.001",
        "UNET Theta": "1",
        "UNET Theta Warmup": "1",
        "UNET Warmup Time Span": "0",
        "UNET Warmup Time Step Hr": "0",
        "UNET Initial Backwater Flow Ratio": "-1",
        "UNET Froude Limit Method": "0",
        "UNET Time Slices": "1",
        "UNET D2 Initial Conditions Time": "",
        "UNET D2 Initial Conditions Ramp Up Fraction": "0.1",
        "Write IC File": "0",
        "Write IC File at Fixed DateTime": "0",
        "IC Time": "",
        "Write IC File Reoccurance": "",
        "Write IC File at Sim End": "0",
        "Echo Input": "0",
        "Echo Parameters": "0",
        "Echo Output": "0",
        "Log Output": "0",
        "Log Hydraulics": "0",
        "HDF Compression": "1",
        "HDF Chunk Size": "",
        "HDF Spatial Parts": "1",
        "HDF Use Max Rows": "0",
        "HDF Fixed Rows": "",
        "HDF Flush": "0",
        "HDF Write Time Slices": "",
        "HDF Write Warmup": "0",
        "HDF Write Downstream Boundaries": "0",
        "DSS File": "dss",
        "DSS Messages": "0",
        "Computation Level Output": "0",
        "Mapping Shallow Grid": "-1",
        "Stored Map Flood": "0",
        "Stored Map Depth": "0",
        "Stored Map Velocity": "0",
        "Stored Map WSEL": "0",
    }


class PlanFile:
    """key=value plan file: defaults + overrides (reference gpras/ras/plan.py:84-124)."""

    def __init__(self, settings: dict[str, str] | None = None,
                 template_path: str | Path | None = None):
        if template_path is not None:
            self.settings = self._read_file(str(template_path))
        else:
            self.settings = default_plan_settings()
        if settings is not None:
            self.settings.update(settings)

    @property
    def lines(self) -> list[str]:
        out = []
        for k, v in self.settings.items():
            row = f"{k}={v}"
            if not row.endswith("\n"):
                row += "\n"
            out.append(row)
        return out

    def emit(self) -> str:
        return "".join(self.lines)

    @staticmethod
    def _read_file(path: str) -> dict[str, str]:
        settings: dict[str, str] = {}
        with open(path) as f:
            for line in f:
                key, sep, value = line.partition("=")
                if not sep:
                    continue
                # partition, not split: values may themselves contain '='
                settings[key] = value.rstrip("\n")
        return settings

    @classmethod
    def from_file(cls, path: str | Path) -> "PlanFile":
        return cls(template_path=path)

    def to_file(self, path: str | Path) -> None:
        with open(path, "w", encoding="ascii", newline="\r\n") as f:
            f.writelines(self.lines)
