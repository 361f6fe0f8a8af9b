from .necks import (FPN, ICNeck, JPU, Feature2Pyramid, MLANeck,
                    MultiLevelNeck)

__all__ = ['FPN', 'MultiLevelNeck', 'Feature2Pyramid', 'JPU', 'ICNeck',
           'MLANeck']
