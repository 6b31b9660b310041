"""Central schema registry.

The reference hard-codes a ``StructType`` per HBase job (three copies:
OrderMasterDataClean.scala:127-151, OrderDetailDataClean.scala:88-101,
ProductBrowseDataClean.scala:77-84) and inherits Hive DDL for everything
else.  Here every table schema lives in one registry, so sources can read
typed parquet directly and tests can generate fixtures.

Time-like *data* columns (``create_time``, ``modified_time`` ...) are STRINGS
in the reference's explicit schemas (OrderMasterDataClean.scala:143-150);
only audit columns are timestamps (SimpleDataCleanUtils.scala:14).  The
registry preserves that.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Audit-column convention (SimpleDataCleanUtils.scala:24-27 for dwd_*,
# CustomerAddrLevelAggrDataClean.scala:35-38 for dws_*)
# ---------------------------------------------------------------------------

def audit_fields(layer: str = "dwd") -> list[T.StructField]:
    return [
        T.StructField(f"{layer}_insert_user", T.StringType()),
        T.StructField(f"{layer}_insert_time", T.TimestampType()),
        T.StructField(f"{layer}_modify_user", T.StringType()),
        T.StructField(f"{layer}_modify_time", T.TimestampType()),
    ]


ETL_DATE_FIELD = T.StructField("etl_date", T.StringType())  # yyyyMMdd partition col


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


# ---------------------------------------------------------------------------
# Reference warehouse tables (ODS shapes; DWD adds audit cols + etl_date last)
# ---------------------------------------------------------------------------

ORDER_MASTER = _s(  # OrderMasterDataClean.scala:127-151 (23 cols)
    ("order_id", T.IntegerType()),
    ("order_sn", T.StringType()),
    ("customer_id", T.IntegerType()),
    ("shipping_user", T.StringType()),
    ("province", T.StringType()),
    ("city", T.StringType()),
    ("address", T.StringType()),
    ("order_source", T.IntegerType()),
    ("payment_method", T.IntegerType()),
    ("order_money", T.DoubleType()),
    ("district_money", T.DoubleType()),
    ("shipping_money", T.DoubleType()),
    ("payment_money", T.DoubleType()),
    ("shipping_comp_name", T.StringType()),
    ("shipping_sn", T.StringType()),
    ("create_time", T.StringType()),
    ("shipping_time", T.StringType()),
    ("pay_time", T.StringType()),
    ("receive_time", T.StringType()),
    ("order_status", T.StringType()),
    ("order_point", T.IntegerType()),
    ("invoice_title", T.StringType()),
    ("modified_time", T.StringType()),
)

ORDER_DETAIL = _s(  # OrderDetailDataClean.scala:88-101 (12 cols)
    ("order_detail_id", T.IntegerType()),
    ("order_sn", T.StringType()),
    ("product_id", T.IntegerType()),
    ("product_name", T.StringType()),
    ("product_cnt", T.IntegerType()),
    ("product_price", T.DoubleType()),
    ("average_cost", T.DoubleType()),
    ("weight", T.DoubleType()),
    ("fee_money", T.DoubleType()),
    ("w_id", T.IntegerType()),
    ("create_time", T.StringType()),
    ("modified_time", T.StringType()),
)

PRODUCT_BROWSE = _s(  # ProductBrowseDataClean.scala:77-84 (6 cols)
    ("log_id", T.IntegerType()),
    ("product_id", T.IntegerType()),
    ("customer_id", T.IntegerType()),
    ("gen_order", T.IntegerType()),
    ("order_sn", T.StringType()),
    ("modified_time", T.StringType()),
)

CUSTOMER_INF = _s(  # columns from CustomerInfDataClean.scala:46-52
    ("customer_id", T.IntegerType()),
    ("customer_name", T.StringType()),
    ("customer_level", T.IntegerType()),
    ("extend_info", T.StringType()),
    ("modified_time", T.TimestampType()),
)

PRODUCT_INFO = _s(  # ProductInfoDataClean.scala:34-39
    ("product_id", T.IntegerType()),
    ("product_name", T.StringType()),
    ("product_core", T.StringType()),
    ("extend_info", T.StringType()),
    ("modified_time", T.TimestampType()),
)

COUPON_INFO = _s(  # CouponInfoDataClean.scala:34-43
    ("coupon_id", T.IntegerType()),
    ("coupon_name", T.StringType()),
    ("coupon_type", T.IntegerType()),
    ("condition_amount", T.DoubleType()),
    ("condition_num", T.IntegerType()),
    ("activity_id", T.IntegerType()),
    ("benefit_amount", T.DoubleType()),
    ("benefit_discount", T.DoubleType()),
    ("modified_time", T.TimestampType()),
)

CUSTOMER_ADDR = _s(  # inferred (FIXTURES.md A7); join col pinned by
    ("addr_id", T.IntegerType()),  # CustomerAddrLevelAggrDataClean.scala:29
    ("customer_id", T.IntegerType()),
    ("province", T.StringType()),
    ("city", T.StringType()),
    ("address", T.StringType()),
    ("modified_time", T.TimestampType()),
)

CUSTOMER_LEVEL_INF = _s(  # join col CustomerAddrLevelAggrDataClean.scala:30
    ("customer_level", T.IntegerType()),
    ("level_name", T.StringType()),
    ("modified_time", T.TimestampType()),
)

CUSTOMER_LOGIN_LOG = _s(
    ("login_id", T.IntegerType()),
    ("customer_id", T.IntegerType()),
    ("login_time", T.TimestampType()),
    ("login_ip", T.StringType()),
)

ORDER_CART = _s(
    ("cart_id", T.IntegerType()),
    ("customer_id", T.IntegerType()),
    ("product_id", T.IntegerType()),
    ("product_amount", T.IntegerType()),
    ("modified_time", T.TimestampType()),
)

COUPON_USE = _s(
    ("coupon_use_id", T.IntegerType()),
    ("coupon_id", T.IntegerType()),
    ("customer_id", T.IntegerType()),
    ("order_id", T.IntegerType()),
    ("coupon_status", T.StringType()),
    ("used_time", T.TimestampType()),
)

#: table name -> ODS schema (without etl_date; partition col is appended by
#: the warehouse writer).  Mirrors the constants blocks in each handler.
ODS_SCHEMAS: dict[str, T.StructType] = {
    "order_master": ORDER_MASTER,
    "order_detail": ORDER_DETAIL,
    "product_browse": PRODUCT_BROWSE,
    "customer_inf": CUSTOMER_INF,
    "product_info": PRODUCT_INFO,
    "coupon_info": COUPON_INFO,
    "customer_addr": CUSTOMER_ADDR,
    "customer_level_inf": CUSTOMER_LEVEL_INF,
    "customer_login_log": CUSTOMER_LOGIN_LOG,
    "order_cart": ORDER_CART,
    "coupon_use": COUPON_USE,
}


def with_partition(schema: T.StructType) -> T.StructType:
    """ODS/DWD physical schema: data columns + etl_date last."""
    return T.StructType(list(schema.fields) + [ETL_DATE_FIELD])


def dwd_schema(table: str, layer: str = "dwd") -> T.StructType:
    """DWD shape: data cols + 4 audit cols + etl_date last (positional
    insertInto contract, SimpleDataCleanUtils.scala:30)."""
    base = ODS_SCHEMAS[table]
    return T.StructType(list(base.fields) + audit_fields(layer) + [ETL_DATE_FIELD])
