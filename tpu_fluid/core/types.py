"""Cell type codes.

Matches the reference's `enum class CellType` (`simulation_constants.h:144-146`)
value-for-value, since the codes appear in persisted state and tests.
"""


class CellType:
    INACTIVE = 0  # out-of-fluid, untouched cell
    AIR = 1       # empty cell bordering water
    WATER = 2     # cell containing >=1 marker particle
    SOLID = 3     # domain boundary / obstacle
