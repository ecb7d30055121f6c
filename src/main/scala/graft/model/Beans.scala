package graft.model

/** The reference's 12-bean entity catalog (SURVEY §1.2) as Scala case
  * classes — `Dataset[T]` rows via `Encoders.product`. Field names and types
  * mirror the reference beans; event time stays a `Long` (epoch seconds or
  * millis, per source) and is converted to `TimestampType` columns at the
  * operator boundary.
  */

/** HotItemsAnalysis/.../beans/UserBehavior.java:15-19 — ts epoch seconds. */
final case class UserBehavior(
    userId: Long,
    itemId: Long,
    categoryId: Int,
    behavior: String,
    timestamp: Long,
)

/** NetworkFlowAnalysis/.../beans/ApacheLogEvent.java:13-17 — ts epoch ms. */
final case class ApacheLogEvent(
    ip: String,
    userId: String,
    timestamp: Long,
    method: String,
    url: String,
)

/** MarketAnalysis/.../beans/MarketingUserBehavior.java:13-16 — ts epoch ms. */
final case class MarketingUserBehavior(
    userId: Long,
    behavior: String,
    channel: String,
    timestamp: Long,
)

/** MarketAnalysis/.../beans/AdClickEvent.java:13-17 — ts epoch seconds. */
final case class AdClickEvent(
    userId: Long,
    adId: Long,
    province: String,
    city: String,
    timestamp: Long,
)

/** LoginFailDetect/.../beans/LoginEvent.java:13-16 — ts epoch seconds. */
final case class LoginEvent(
    userId: Long,
    ip: String,
    loginState: String,
    timestamp: Long,
)

/** OrderPayDetect/.../beans/OrderEvent.java:13-16 — ts epoch seconds; txId
  * empty for "create" events.
  */
final case class OrderEvent(
    orderId: Long,
    eventType: String,
    txId: String,
    timestamp: Long,
)

/** OrderPayDetect/.../beans/ReceiptEvent.java:13-15 — ts epoch seconds. */
final case class ReceiptEvent(
    txId: String,
    payChannel: String,
    timestamp: Long,
)

// ----- result types ----------------------------------------------------

/** HotItemsAnalysis/.../beans/ItemViewCount.java:13-15. */
final case class ItemViewCount(itemId: Long, windowEnd: Long, count: Long)

/** NetworkFlowAnalysis/.../beans/PageViewCount.java:14-16. */
final case class PageViewCount(url: String, windowEnd: Long, count: Long)

/** MarketAnalysis/.../beans/ChannelPromotionCount.java:13-16. */
final case class ChannelPromotionCount(
    channel: String,
    behavior: String,
    windowEnd: String,
    count: Long,
)

/** MarketAnalysis/.../beans/AdCountViewByProvince.java:13-15. */
final case class AdCountViewByProvince(province: String, windowEnd: String, count: Long)

/** MarketAnalysis/.../beans/BlackListUserWarning.java:13-15. */
final case class BlackListUserWarning(userId: Long, adId: Long, warningMsg: String)

/** LoginFailDetect/.../beans/LoginFailWarning.java:13-16. */
final case class LoginFailWarning(
    userId: Long,
    firstFailTime: Long,
    lastFailTime: Long,
    warningMsg: String,
)

/** OrderPayDetect/.../beans/OrderResult.java:13-14. */
final case class OrderResult(orderId: Long, resultState: String)

/** Matched (pay, receipt) pair — OrderPayDetect TxPayMatch main output. */
final case class TxMatch(pay: OrderEvent, receipt: ReceiptEvent)
