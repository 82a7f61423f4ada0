from .field import (
    AnchorField,
    init_field_params,
    init_field_from_points,
    generate_neural_gaussians,
    render_field,
)
