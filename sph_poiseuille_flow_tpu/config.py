"""Configuration layer: INI parsing + derived-parameter computation.

Re-expresses the reference's config pipeline (reference: SPH_Poiseuille.m:43-91,
447-512) as a pure-Python layer producing an immutable ``SPHConfig``. All
derived-parameter quirks of the reference are reproduced deliberately:

* DL / DH are snapped to integer multiples of dp (SPH_Poiseuille.m:62-68).
* ``transport_coeff`` is hard-coded to 0.30 (SPH_Poiseuille.m:77 — the README
  claims 0.1 but the code wins).
* ``c_f`` acts directly as the artificial sound speed: p0 = rho0*c_f**2
  (SPH_Poiseuille.m:78) and the acoustic dt uses c_f itself
  (SPH_Poiseuille.m:522), despite the README's "c = c_f*U_bulk" comment.
* ``h = 1.3*dp``; ``wall_thickness = max(4*dp, ceil(2h/dp)*dp)``
  (SPH_Poiseuille.m:73-75).
* ``inv_sigma0 = dp**2`` (SPH_Poiseuille.m:79).
"""

from __future__ import annotations

import dataclasses
import math
import os
import re
from typing import Dict, Union

IniValue = Union[float, str]
IniDict = Dict[str, Dict[str, IniValue]]

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_TRAILING_COMMENT_RE = re.compile(r"[;#].*$")


class ConfigError(ValueError):
    """Raised on malformed INI content or invalid parameter values."""


def parse_ini_text(text: str) -> IniDict:
    """Parse INI text with the reference's exact rules.

    Rules (reference: SPH_Poiseuille.m:447-499): blank lines skipped; lines
    starting with ';' or '#' skipped; ``[section]`` headers must be valid
    identifiers; ``key = value`` lines strip trailing ``;``/``#`` comments;
    values are coerced to float when possible, kept as strings otherwise;
    key/value lines outside any section are an error; lines without '=' are
    silently ignored.
    """
    cfg: IniDict = {}
    section = ""
    for raw_line in re.split(r"\r\n|\n|\r", text):
        line = raw_line.strip()
        if not line:
            continue
        if line.startswith(";") or line.startswith("#"):
            continue
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1].strip()
            if not _IDENT_RE.match(section):
                raise ConfigError(f"invalid INI section name: {section!r}")
            cfg.setdefault(section, {})
            continue
        eq = line.find("=")
        if eq < 0:
            continue
        key = line[:eq].strip()
        val_raw = _TRAILING_COMMENT_RE.sub("", line[eq + 1:]).strip()
        if not section:
            raise ConfigError(f"INI key/value outside any section: {line!r}")
        if not _IDENT_RE.match(key):
            raise ConfigError(f"invalid INI key name: {key!r}")
        try:
            cfg[section][key] = float(val_raw)
        except ValueError:
            cfg[section][key] = val_raw
    return cfg


def parse_ini(path: str) -> IniDict:
    if not os.path.exists(path):
        raise ConfigError(f"config file does not exist: {path}")
    with open(path, "r", encoding="utf-8") as f:
        return parse_ini_text(f.read())


def get_ini_numeric(cfg: IniDict, section: str, key: str) -> float:
    """Fetch a numeric value, mirroring the reference's validation errors
    (reference: SPH_Poiseuille.m:501-512)."""
    if section not in cfg:
        raise ConfigError(f"missing section: [{section}]")
    if key not in cfg[section]:
        raise ConfigError(f"missing key: [{section}].{key}")
    value = cfg[section][key]
    if not isinstance(value, float) or not math.isfinite(value):
        raise ConfigError(f"key [{section}].{key} is not a valid finite number")
    return value


@dataclasses.dataclass(frozen=True)
class SPHConfig:
    """Immutable simulation configuration with all derived parameters.

    Raw fields come from config.ini ([physical] + [simulation]); derived
    fields reproduce SPH_Poiseuille.m:62-91.
    """

    # --- raw [physical] ---
    DL: float
    DH: float
    dp: float
    rho0: float
    mu: float
    U_bulk: float
    c_f: float
    # --- raw [simulation] ---
    end_time: float
    output_interval: float
    sort_interval: int
    restart_from_file: bool
    # --- derived ---
    gravity_g: float
    U_max: float
    h: float
    cutoff_depth: float
    wall_thickness: float
    periodic_buffer: float
    transport_coeff: float
    p0: float
    inv_sigma0: float
    nu: float
    # --- TPU-native engine knobs (no reference counterpart) ---
    engine: str = "auto"            # "auto" (pallas on TPU, cellgrid
    #                               elsewhere) | "pallas" | "cellgrid" |
    #                               "gather"
    dtype: str = "float32"          # state dtype on device
    cell_capacity: int = 16         # max particles per neighbor-grid cell
    neighbor_capacity: int = 48     # compacted per-particle candidate slots
    neighbor_skin: float = 0.0      # extra candidate radius (enables reuse)
    rebuild_every: int = 1          # candidate-list refresh cadence (steps)
    # lane-packed grid columns for the fused engine (0 = auto cost-model
    # pick; SPH_LANEPACK_NX env still overrides for probing). At integer
    # cell_x/dp ratios the pristine per-cell occupancy drops a full
    # lattice column, admitting a smaller cell_capacity
    lane_pack_nx: int = 0
    # one-sided wall viscous factor: 4.0 is the reference's hard-coded
    # calibration (sph_physics_mex.c:383-388, 526); adjustable to calibrate
    # out the first-order wall-slip bias of the scheme
    wall_visc_factor: float = 4.0
    # in-loop step log cadence (0 = off): emits the reference's per-step
    # log line (step/dt/vmax/tau, SPH_Poiseuille.m:285-291) from inside the
    # device loop via jax.debug.print — costs host syncs, debugging only
    step_log_every: int = 0
    # --- fused-engine perf knobs (defaults == the auto behavior every
    # validated run shipped with; env vars SPH_GEOM_CACHE / SPH_GEOM_KCUT /
    # SPH_SUB_STEPS / SPH_FUSED_ROWS / SPH_CELLY_MARGIN still override for
    # probing, so a config file + command line fully reproduces a run) ---
    geom_cache: str = "auto"        # geometry-cache layout: auto (VMEM
    #                               cost model picks full/ring/partial/
    #                               none) | full | ring | partial | none
    geom_kcut: int = 0              # cached anchor ranks for "partial"
    #                               (0 = auto-fit to the VMEM budget)
    sub_steps: int = 16             # steps per fused chunk kernel call
    #                               (amortizes ~0.13 ms fixed call cost;
    #                               capped by rebuild_every)
    fused_rows: str = "auto"        # k-loop order: auto | "1" row-outer |
    #                               "0" slab-outer (see fused_cell.use_rows)
    plan_r: int = 0                 # fused row-group width R (0 = auto:
    #                               R=1 when one row fills the lanes,
    #                               nx >= 100; else the padded-cost
    #                               model — see fused_cell.plan)
    celly_margin: float = 0.06      # lane-pack cell_y lattice-aliasing
    #                               margin, in dp units (compression
    #                               tolerance of the occupancy bound)
    max_steps_per_dispatch: int = 0  # split each output interval into
    #                               device calls of at most N steps
    #                               (0 = one call per interval).
    #                               TRAJECTORY-PRESERVING: the Kahan
    #                               interval clock carries across calls
    #                               and the dt remainder clamp fires only
    #                               at the true output point, so the
    #                               split run is bit-identical to the
    #                               unsplit one. Use when one interval's
    #                               single dispatch would exceed the
    #                               device deadline (the tunneled TPU
    #                               kills dispatches past ~60 s)

    @property
    def signature(self) -> str:
        """Config signature guarding restart compatibility
        (reference: SPH_Poiseuille.m:514-517)."""
        return (
            "DL={DL:.12g}|DH={DH:.12g}|dp={dp:.12g}|rho0={rho0:.12g}|"
            "mu={mu:.12g}|Ub={Ub:.12g}|cf={cf:.12g}|t={t:.12g}|oi={oi:.12g}|"
            "si={si:d}|wall=thick-wall-noslip-dual-dt"
        ).format(
            DL=self.DL, DH=self.DH, dp=self.dp, rho0=self.rho0, mu=self.mu,
            Ub=self.U_bulk, cf=self.c_f, t=self.end_time,
            oi=self.output_interval, si=self.sort_interval,
        )

    @property
    def n_bins(self) -> int:
        """Mid-channel profile bin count (reference: SPH_Poiseuille.m:234)."""
        return max(20, int(round(self.DH / self.dp)))

    @property
    def mid_x(self) -> float:
        return 0.5 * self.DL

    @property
    def mid_half_width(self) -> float:
        return max(self.dp, self.h)

    @property
    def tau_target(self) -> float:
        """Analytic wall shear stress g*rho0*DH/2 (SPH_Poiseuille.m:231)."""
        return self.gravity_g * self.rho0 * self.DH / 2.0

    def analytic_u(self, y):
        """Analytic Poiseuille profile u(y) = g/(2 nu) * y * (DH - y)
        (reference: SPH_Poiseuille.m:623)."""
        return self.gravity_g / (2.0 * self.nu) * y * (self.DH - y)


def derive_config(
    DL: float, DH: float, dp: float, rho0: float, mu: float,
    U_bulk: float, c_f: float, end_time: float, output_interval: float,
    sort_interval: int, restart_from_file: bool, **engine_kwargs,
) -> SPHConfig:
    """Compute all derived parameters (reference: SPH_Poiseuille.m:62-91)."""
    if dp <= 0 or DL <= 0 or DH <= 0:
        raise ConfigError("DL, DH, dp must be positive")
    if rho0 <= 0 or mu < 0 or c_f <= 0:
        raise ConfigError("rho0, c_f must be positive and mu non-negative")
    if sort_interval <= 0:
        raise ConfigError("sort_interval must be a positive integer")

    # Geometry snapping: DL/dp and DH/dp forced to integers.
    DL = round(DL / dp) * dp
    DH = round(DH / dp) * dp

    gravity_g = 12.0 * mu * U_bulk / (rho0 * DH ** 2)
    U_max = 1.5 * U_bulk
    h = 1.3 * dp
    cutoff_depth = math.ceil((2.0 * h) / dp - 1e-12) * dp
    wall_thickness = max(4.0 * dp, cutoff_depth)
    p0 = rho0 * c_f ** 2
    inv_sigma0 = dp ** 2
    nu = mu / rho0

    # minimum-image correctness requires the cutoff to fit in half the box
    if 2.0 * h >= 0.5 * DL:
        raise ConfigError(
            f"kernel cutoff 2h={2*h:g} must be < DL/2={DL/2:g} for the "
            "minimum-image periodic convention")

    return SPHConfig(
        DL=DL, DH=DH, dp=dp, rho0=rho0, mu=mu, U_bulk=U_bulk, c_f=c_f,
        end_time=end_time, output_interval=output_interval,
        sort_interval=int(sort_interval),
        restart_from_file=bool(restart_from_file),
        gravity_g=gravity_g, U_max=U_max, h=h, cutoff_depth=cutoff_depth,
        wall_thickness=wall_thickness, periodic_buffer=0.0,
        transport_coeff=0.30, p0=p0, inv_sigma0=inv_sigma0, nu=nu,
        **engine_kwargs,
    )


# The (section, key) pairs load_config actually consumes. Overrides outside
# this set would be silently ignored (e.g. --set physical.end_time=...,
# which lives in [simulation]), so they are rejected up front. The INI file
# itself is NOT validated against this set — extra file keys are parsed
# and ignored, matching the reference parser, which accepts any
# legally-named key and errors only on MISSING consumed keys
# (SPH_Poiseuille.m:447-512 parse_ini/get_ini_numeric).
_CONSUMED_INI_KEYS = {
    "physical": frozenset({"DL", "DH", "dp", "rho0", "mu", "U_bulk", "c_f"}),
    "simulation": frozenset({"end_time", "output_interval", "sort_interval",
                             "restart_from_file"}),
}


def load_config(path: str, ini_overrides=None, **engine_kwargs) -> SPHConfig:
    """Load + derive a config from an INI file path. ``ini_overrides`` is a
    nested {section: {key: value}} dict applied over the parsed file (the
    CLI's --set mechanism). Unknown override section/key pairs raise
    ConfigError instead of being silently dropped."""
    ini = parse_ini(path)
    for section, kv in (ini_overrides or {}).items():
        known = _CONSUMED_INI_KEYS.get(section)
        if known is None:
            raise ConfigError(
                f"--set: unknown section {section!r}; valid sections: "
                + ", ".join(sorted(_CONSUMED_INI_KEYS)))
        for name in kv:
            if name not in known:
                hint = next((f" (did you mean {s}.{name}?)"
                             for s, ks in _CONSUMED_INI_KEYS.items()
                             if s != section and name in ks), "")
                raise ConfigError(
                    f"--set: unknown key {section}.{name}{hint}; valid keys "
                    f"in [{section}]: " + ", ".join(sorted(known)))
        ini.setdefault(section, {}).update(kv)
    return derive_config(
        DL=get_ini_numeric(ini, "physical", "DL"),
        DH=get_ini_numeric(ini, "physical", "DH"),
        dp=get_ini_numeric(ini, "physical", "dp"),
        rho0=get_ini_numeric(ini, "physical", "rho0"),
        mu=get_ini_numeric(ini, "physical", "mu"),
        U_bulk=get_ini_numeric(ini, "physical", "U_bulk"),
        c_f=get_ini_numeric(ini, "physical", "c_f"),
        end_time=get_ini_numeric(ini, "simulation", "end_time"),
        output_interval=get_ini_numeric(ini, "simulation", "output_interval"),
        sort_interval=int(round(get_ini_numeric(ini, "simulation", "sort_interval"))),
        restart_from_file=bool(round(get_ini_numeric(ini, "simulation", "restart_from_file"))),
        **engine_kwargs,
    )


def env_override(env_name: str, default_value: str) -> str:
    """Env-var path override (reference: SPH_Poiseuille.m:350-355)."""
    value = os.environ.get(env_name, "")
    return value if value else default_value
