from .base import EnvBase
from .zoo import (
    available_envs, make_env,
    EnvSimple2D, EnvSimple2DExtraObjects, EnvCircle2D, EnvDense2D,
    EnvDense2DExtraObjects, EnvGridCircles2D, EnvMazeBoxes3D,
    EnvNarrowPassageDense2D, EnvNarrowPassageDense2DExtraObjects,
    EnvPlanar2Link, EnvSpheres3D, EnvSpheres3DExtraObjects, EnvSquare2D,
    EnvTableShelf,
)
