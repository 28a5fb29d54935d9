from .unproject_pallas import (bilinear_gather,  # noqa: F401
                               unproject_features_pallas)
